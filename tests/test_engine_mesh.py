"""Whole-engine mesh parity (VERDICT r2 weak #4): the same sequence driven
through SlamEngine with and without an 8-device 'kf' mesh must produce the
same trajectory — upgrading the multichip dryrun from "finite" to
"correct".  The sharded engine splits the keyframe cloud banks and the
Scan Context descriptor bank over 'kf' (pipeline._shard_state); XLA
inserts the collectives for submap gathers and retrieval."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.pipeline import SlamEngine
from sc_lego_loam_tpu.utils import synthetic

N = 40


def _cfg():
    cfg = tiny_test_config()
    return cfg.replace(
        sc=dataclasses.replace(cfg.sc, exclude_recent=10),
        loop=dataclasses.replace(
            cfg.loop, check_every_ticks=2, rs_time_gap=4.0,
            rs_search_radius=4.0),
    )


@pytest.fixture(scope="module")
def seq():
    cfg = _cfg()
    return synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=12.0, loops=1.05,
        noise=0.01, seed=3, shuffle=True)


def _run(cfg, seq, mesh=None):
    scans, valids, _ = seq
    eng = SlamEngine(cfg, mesh=mesh)
    for i in range(N):
        eng.process_scan(scans[i], valids[i], t=i * 0.1)
    return eng


def test_engine_mesh_matches_single_device(seq):
    cfg = _cfg()
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide the 8-device CPU mesh"
    mesh = Mesh(np.asarray(devs[:8]), axis_names=("kf",))

    ref = _run(cfg, seq)
    sh = _run(cfg, seq, mesh=mesh)

    t_ref = ref.trajectory_array()
    t_sh = sh.trajectory_array()
    assert np.isfinite(t_sh).all()
    np.testing.assert_allclose(t_sh[:, :3, 3], t_ref[:, :3, 3], atol=1e-3)
    assert int(sh.map.kf.count) == int(ref.map.kf.count)
    assert int(sh.loops_closed) == int(ref.loops_closed)
