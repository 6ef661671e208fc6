import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import posegraph
from sc_lego_loam_tpu.utils import se3


def _chain(cfg, n, drift=0.0, seed=0):
    """Ground-truth square loop + drifty odometry measurements.
    Returns (gt (n,4,4), est_poses6 (K,6), odom_z (K,4,4), count)."""
    rng = np.random.default_rng(seed)
    K = cfg.cap.max_keyframes
    gt = [np.eye(4, dtype=np.float32)]
    side = max(n // 4, 1)
    for i in range(1, n):
        step = np.eye(4, dtype=np.float32)
        step[0, 3] = 1.0
        if i % side == 0:
            c, s = 0.0, 1.0
            step[:2, :2] = [[c, -s], [s, c]]
        gt.append((gt[-1] @ step).astype(np.float32))
    gt = np.stack(gt)

    odom_z = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    odom_z[0] = gt[0]
    est = [gt[0]]
    for i in range(1, n):
        Z = np.linalg.inv(gt[i - 1]) @ gt[i]
        if drift > 0:
            noise = se3.se3_exp(jnp.asarray(
                rng.normal(0, drift, 6), jnp.float32))
            Z = Z @ np.asarray(noise)
        odom_z[i] = Z
        est.append((est[-1] @ Z).astype(np.float32))
    est = np.stack(est)
    poses6 = np.zeros((K, 6), np.float32)
    poses6[:n] = np.asarray(se3.mat_to_pose6(jnp.asarray(est)))
    return gt, jnp.asarray(poses6), jnp.asarray(odom_z), jnp.int32(n)


def test_no_loops_is_fixed_point():
    """With no loop factors, the odometry chain already satisfies every
    factor — solve must leave the poses (nearly) unchanged.  Compare pose
    matrices (euler 6-vectors wrap at +-pi)."""
    cfg = tiny_test_config()
    gt, poses6, odom_z, count = _chain(cfg, 12, drift=0.0)
    loops = posegraph.init_loops(cfg)
    out = posegraph.solve(cfg, poses6, count, odom_z, loops)
    np.testing.assert_allclose(
        np.asarray(se3.pose6_to_mat(out[:12])),
        np.asarray(se3.pose6_to_mat(poses6[:12])), atol=1e-3)


def test_loop_closes_drift():
    """A drifty square loop plus one exact loop factor: the loop ends must
    be pulled together.

    Note on weights: with the reference's literal odometry variances
    (1e-6/1e-8, mO.cpp:368-371) a short 20-node chain is so stiff that
    ignoring the (var 0.5) loop factor is the true optimum — corrections in
    the reference come from rotational lever arms over hundreds of
    keyframes, and from *accumulating* loop factors (one per 1 Hz tick
    while revisiting; see the mO.cpp:997 comment that the robust kernel
    "requires more true-positive loop factors").  To test the mechanism at
    unit-test scale we relax the odometry variances and add a few factors,
    as the reference does in practice."""
    from sc_lego_loam_tpu.config import PoseGraphConfig, LoopClosureConfig
    cfg = tiny_test_config().replace(
        posegraph=PoseGraphConfig(odom_var=(1e-2,) * 6),
        loop=LoopClosureConfig(loop_noise_var=1e-2))
    n = 20
    gt, poses6, odom_z, count = _chain(cfg, n, drift=0.02, seed=1)
    # Loop factors between last and first node with the exact relative pose.
    Z = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], jnp.float32)
    loops = posegraph.init_loops(cfg)
    for _ in range(3):
        loops = posegraph.add_loop(loops, jnp.int32(n - 1), jnp.int32(0), Z)

    before = np.asarray(se3.pose6_to_mat(poses6[:n]))
    out = posegraph.solve(cfg, poses6, count, odom_z, loops)
    after = np.asarray(se3.pose6_to_mat(out[:n]))

    # Residual of the loop factor before/after.
    def loop_res(X):
        return np.linalg.norm(se3.se3_log(jnp.asarray(
            np.linalg.inv(np.asarray(Z)) @ np.linalg.inv(X[n - 1]) @ X[0],
            jnp.float32)))

    assert loop_res(after) < 0.3 * max(loop_res(before), 1e-9) + 1e-3
    # Node 0 stays anchored by the prior.
    np.testing.assert_allclose(after[0], gt[0], atol=1e-2)
    # Overall closer to ground truth.
    e_before = np.linalg.norm(before[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    e_after = np.linalg.norm(after[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    assert e_after < e_before


def test_cauchy_rejects_bad_loop():
    """A wildly wrong loop factor must be downweighted by the Cauchy kernel
    and not destroy a correct trajectory."""
    cfg = tiny_test_config()
    n = 16
    gt, poses6, odom_z, count = _chain(cfg, n, drift=0.0)
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = [50.0, -30.0, 10.0]
    loops = posegraph.init_loops(cfg)
    loops = posegraph.add_loop(loops, jnp.int32(n - 1), jnp.int32(0),
                               jnp.asarray(bad))
    out = posegraph.solve(cfg, poses6, count, odom_z, loops)
    after = np.asarray(se3.pose6_to_mat(out[:n]))
    err = np.linalg.norm(after[:, :3, 3] - gt[:, :3, 3], axis=1).max()
    assert err < 1.0, f"bad loop dragged poses by {err} m"
