"""True multi-process jax.distributed test (SURVEY.md par.5 communication
backend; VERDICT r2 missing #6): two local CPU processes form one JAX
distributed system via ``parallel.mesh.init_distributed``, build a global
2-device mesh, and run a psum plus a process-spanning sharded Scan Context
retrieval — the keyframe-bank scale-out path — checking the result against
the single-process answer.

Runs the workers with 1 local CPU device each, so the global mesh
necessarily spans processes (any collective crosses the process
boundary)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)   # exactly one local device per process

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.getcwd())
from sc_lego_loam_tpu.parallel import mesh as mesh_mod

coord = sys.argv[1]
pid = int(sys.argv[2])

n = mesh_mod.init_distributed(coordinator=coord, num_processes=2,
                              process_id=pid)
assert n == 2, f"global devices {n}"
assert jax.process_count() == 2

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import jax.numpy as jnp

devs = np.asarray(jax.devices()).reshape(1, 2)
mesh = Mesh(devs, axis_names=("seq", "kf"))

# (1) Cross-process collective: psum over the kf axis.
from jax.experimental.multihost_utils import process_allgather


@jax.jit
def tot(x):
    return x.sum()


x = jax.device_put(
    jnp.arange(8, dtype=jnp.float32),
    NamedSharding(mesh, P("kf")))
s = tot(x)                      # XLA inserts the cross-process reduce
assert float(s) == 28.0, float(s)

# (2) Process-spanning sharded retrieval: descriptor bank split over 'kf'
# across the two processes (models/scan_context.detect is jit over a
# sharded bank; XLA inserts the all-reduce argmin).
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.models import scan_context as sc

cfg = tiny_test_config()
rng = np.random.default_rng(0)
K = 16
bank = sc.init_bank(cfg)
descs = rng.random((K, cfg.sc.num_ring, cfg.sc.num_sector)).astype(
    np.float32)
for i in range(K):
    bank = sc.append(bank, jnp.asarray(descs[i]), cfg.cap.max_keyframes)
query = jnp.asarray(descs[3])   # exact revisit of keyframe 3

# Reference answer on the local (replicated) bank.
ref_i, ref_d, _ = sc.detect(cfg, bank, query)

bank_sh = bank._replace(
    desc=jax.device_put(bank.desc, NamedSharding(mesh, P("kf"))),
    ringkey=jax.device_put(bank.ringkey, NamedSharding(mesh, P("kf"))))
i2, d2, _ = sc.detect(cfg, bank_sh, query)
assert int(i2) == int(ref_i), (int(i2), int(ref_i))
np.testing.assert_allclose(float(d2), float(ref_d), atol=1e-5)

print(f"WORKER{pid}_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out, out
