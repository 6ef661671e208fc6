"""Split the per-scan engine cost: perception-only vs mapping vs loop.

Feeds the same synthetic sequence as bench.py but forces the mapping gate
on/off, measuring the steady-state per-scan wall (device) time of each
configuration.  The difference isolates the mapping tick / loop tick cost.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu.pipeline import SlamEngine, engine_step, init_engine_state
from sc_lego_loam_tpu.utils import synthetic

cfg = synthetic_config()
print("backend:", jax.default_backend(), flush=True)

N = 40
scans, valids, gt = synthetic.make_sequence(cfg.lidar, N, trajectory="straight",
                                            step=0.4, noise=0.01, seed=11,
                                            shuffle=False)
scans = [jax.device_put(jnp.asarray(s)) for s in scans]
valids = [jax.device_put(jnp.asarray(v)) for v in valids]


def run(tag, map_every):
    eng = SlamEngine(cfg)
    # warmup covers all compile paths
    for i in range(16):
        do_map = (i % max(map_every, 1) == 0) if map_every else False
        eng.last_map_time = -1e9 if do_map else 1e9
        p = eng.process_scan(scans[i % N], valids[i % N], t=i * 0.1)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    M = 24
    for i in range(M):
        do_map = (i % max(map_every, 1) == 0) if map_every else False
        eng.last_map_time = -1e9 if do_map else 1e9
        p = eng.process_scan(scans[i % N], valids[i % N], t=(16 + i) * 0.1)
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / M
    print(f"{tag:<40} {dt*1e3:8.2f} ms/scan", flush=True)
    return dt


t_p = run("perception only (no mapping)", 0)
t_m3 = run("mapping every 3rd scan", 3)
t_m1 = run("mapping every scan", 1)
print(f"\nimplied mapping-tick cost: {(t_m1 - t_p)*1e3:.2f} ms")
print(f"perception-only fps:       {1/t_p:.1f}")
