"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.models import scan_context as sc
from sc_lego_loam_tpu import posegraph
from sc_lego_loam_tpu.parallel import mesh as mesh_mod
from sc_lego_loam_tpu.parallel import retrieval


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return mesh_mod.make_mesh(n_kf=4, n_seq=2)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"seq": 2, "kf": 4}


def test_sharded_retrieval_matches_single_device(mesh8):
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    K = cfg.cap.max_keyframes
    bank = sc.init_bank(cfg)
    descs = []
    for i in range(60):
        d = jnp.asarray(
            rng.random((cfg.sc.num_ring, cfg.sc.num_sector)), jnp.float32)
        descs.append(d)
        bank = sc.append(bank, d, K)
    query = descs[4]

    ref_idx, ref_dist, ref_yaw = sc.detect(cfg, bank, query)

    from jax.sharding import NamedSharding, PartitionSpec as P
    desc_sharded = jax.device_put(bank.desc, NamedSharding(mesh8, P("kf")))
    idx, dist, yaw = retrieval.detect_sharded(
        cfg, mesh8, desc_sharded, bank.count, query)

    assert int(idx) == int(ref_idx)
    np.testing.assert_allclose(float(dist), float(ref_dist), atol=1e-5)
    np.testing.assert_allclose(float(yaw), float(ref_yaw), atol=1e-6)


def test_distributed_posegraph_matches_single_device(mesh8):
    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    K = cfg.cap.max_keyframes
    n = 24

    # Drifty chain + one loop factor (same fixture style as test_posegraph).
    from sc_lego_loam_tpu.utils import se3
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        step = np.eye(4, dtype=np.float32)
        step[0, 3] = 1.0
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    odom_z = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    odom_z[0] = gt[0]
    est = [gt[0]]
    for i in range(1, n):
        Z = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            rng.normal(0, 0.01, 6), jnp.float32)))
        Z = (Z @ noise).astype(np.float32)
        odom_z[i] = Z
        est.append((est[-1] @ Z).astype(np.float32))
    poses6 = np.zeros((K, 6), np.float32)
    poses6[:n] = np.asarray(se3.mat_to_pose6(jnp.asarray(np.stack(est))))

    loops = posegraph.init_loops(cfg)
    Zl = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], jnp.float32)
    loops = posegraph.add_loop(loops, jnp.int32(n - 1), jnp.int32(0), Zl)

    ref = posegraph.solve(cfg, jnp.asarray(poses6), jnp.int32(n),
                          jnp.asarray(odom_z), loops)

    from jax.sharding import NamedSharding, PartitionSpec as P
    shard_l = NamedSharding(mesh8, P("kf"))
    loops_sharded = posegraph.LoopFactors(
        i=jax.device_put(loops.i, shard_l),
        j=jax.device_put(loops.j, shard_l),
        z=jax.device_put(loops.z, NamedSharding(mesh8, P("kf", None, None))),
        count=loops.count)
    out = posegraph.solve(
        cfg, jnp.asarray(poses6), jnp.int32(n),
        jnp.asarray(odom_z), loops_sharded, mesh=mesh8)

    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref)[:n],
                               atol=5e-3)
