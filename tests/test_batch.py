"""Multi-sequence batch mapping (BASELINE.json config 4) on the virtual
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.parallel.batch import BatchEngine, find_cross_loops
from sc_lego_loam_tpu.models import scan_context
from sc_lego_loam_tpu.utils import synthetic


def test_batch_engine_two_sequences():
    cfg = tiny_test_config()
    n = 5
    s0, v0, g0 = synthetic.make_sequence(cfg.lidar, n, step=0.4, seed=7)
    s1, v1, g1 = synthetic.make_sequence(cfg.lidar, n, step=0.4, seed=7,
                                         yaw_rate=0.05)
    eng = BatchEngine(cfg, n_seq=2)
    for i in range(n):
        pts = np.stack([s0[i], s1[i]])
        msk = np.stack([v0[i], v1[i]])
        fused = eng.process_scans(pts, msk, t=i * 0.1)
    assert np.isfinite(np.asarray(fused)).all()
    # Both sequences accumulated keyframes independently.
    counts = np.asarray(eng.map.kf.count)
    assert counts.shape == (2,)
    assert (counts >= 1).all()
    # Trajectories advanced along +x for both.
    t0 = np.stack(eng.trajectories[0])
    t1 = np.stack(eng.trajectories[1])
    assert t0[-1][0, 3] > 0.5
    assert t1[-1][0, 3] > 0.5
    # The yawing sequence curves away from the straight one.
    assert abs(t1[-1][1, 3] - t0[-1][1, 3]) > 1e-3


def test_find_cross_loops_same_world():
    """Two banks built from the same descriptors must cross-match."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    bank_a = scan_context.init_bank(cfg)
    bank_b = scan_context.init_bank(cfg)
    K = cfg.cap.max_keyframes
    for i in range(6):
        d = jnp.asarray(rng.random((cfg.sc.num_ring, cfg.sc.num_sector)),
                        jnp.float32)
        bank_a = scan_context.append(bank_a, d, K)
        # B holds the same scenes yaw-rotated (rolled columns).
        bank_b = scan_context.append(bank_b, jnp.roll(d, 10, axis=1), K)
    hits = find_cross_loops(cfg, bank_a, bank_b)
    assert len(hits) >= 4
    for ia, ib, dist, yaw in hits:
        assert ia == ib
        assert dist < 0.05
