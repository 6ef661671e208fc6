"""Map / trajectory export & checkpointing.

Replaces the reference's end-of-run PCD dump (C22, mapOptmization.cpp:
756-781 writes /tmp/{finalCloud,cornerMap,surfaceMap,trajectory}.pcd) and
adds what the reference lacks (SURVEY.md par.5): full engine-state
checkpoint/resume — keyframe store, pose graph, and Scan Context bank
serialized to NPZ so a mapping session can be resumed or re-optimized.
"""

from __future__ import annotations

import numpy as np


def save_ply(path: str, points: np.ndarray):
    """ASCII PLY point cloud (readable by CloudCompare/Meshlab/Open3D)."""
    points = np.asarray(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in points:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def save_trajectory_tum(path: str, times: np.ndarray, poses: np.ndarray):
    """TUM format: t x y z qx qy qz qw (for external ATE tooling)."""
    from . import se3  # lazy: jax import
    import jax.numpy as jnp
    with open(path, "w") as f:
        for t, T in zip(times, poses):
            R = T[:3, :3]
            # Rotation matrix -> quaternion (w last).
            w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 0.0)) / 2
            if w > 1e-6:
                qx = (R[2, 1] - R[1, 2]) / (4 * w)
                qy = (R[0, 2] - R[2, 0]) / (4 * w)
                qz = (R[1, 0] - R[0, 1]) / (4 * w)
            else:
                aa = np.asarray(se3.so3_log(jnp.asarray(R, jnp.float32)))
                ang = np.linalg.norm(aa)
                ax = aa / max(ang, 1e-9)
                qx, qy, qz = ax * np.sin(ang / 2)
                w = np.cos(ang / 2)
            f.write(f"{t:.6f} {T[0,3]:.6f} {T[1,3]:.6f} {T[2,3]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {w:.6f}\n")


def save_checkpoint(path: str, engine):
    """Serialize full engine state (keyframes, loops, SC bank) to NPZ."""
    kf = engine.map.kf
    np.savez_compressed(
        path,
        poses6=np.asarray(kf.poses6), times=np.asarray(kf.times),
        corner=np.asarray(kf.corner), corner_mask=np.asarray(kf.corner_mask),
        surf=np.asarray(kf.surf), surf_mask=np.asarray(kf.surf_mask),
        outlier=np.asarray(kf.outlier),
        outlier_mask=np.asarray(kf.outlier_mask),
        odom_z=np.asarray(kf.odom_z), kf_count=np.asarray(kf.count),
        sc_desc=np.asarray(engine.bank.desc),
        sc_ringkey=np.asarray(engine.bank.ringkey),
        sc_count=np.asarray(engine.bank.count),
        loop_i=np.asarray(engine.loops.i), loop_j=np.asarray(engine.loops.j),
        loop_z=np.asarray(engine.loops.z),
        loop_count=np.asarray(engine.loops.count),
        correction=np.asarray(engine.map.correction),
        pose=np.asarray(engine.map.pose),
    )


def load_checkpoint(path: str, engine):
    """Restore engine state saved by save_checkpoint (in place)."""
    import jax.numpy as jnp
    z = np.load(path)
    kf = engine.map.kf._replace(
        poses6=jnp.asarray(z["poses6"]), times=jnp.asarray(z["times"]),
        corner=jnp.asarray(z["corner"]),
        corner_mask=jnp.asarray(z["corner_mask"]),
        surf=jnp.asarray(z["surf"]), surf_mask=jnp.asarray(z["surf_mask"]),
        outlier=jnp.asarray(z["outlier"]),
        outlier_mask=jnp.asarray(z["outlier_mask"]),
        odom_z=jnp.asarray(z["odom_z"]),
        count=jnp.asarray(z["kf_count"]))
    engine.map = engine.map._replace(
        kf=kf, correction=jnp.asarray(z["correction"]),
        pose=jnp.asarray(z["pose"]))
    engine.bank = engine.bank._replace(
        desc=jnp.asarray(z["sc_desc"]), ringkey=jnp.asarray(z["sc_ringkey"]),
        count=jnp.asarray(z["sc_count"]))
    engine.loops = engine.loops._replace(
        i=jnp.asarray(z["loop_i"]), j=jnp.asarray(z["loop_j"]),
        z=jnp.asarray(z["loop_z"]), count=jnp.asarray(z["loop_count"]))
    return engine


def global_map_points(engine, max_points: int = 500_000) -> np.ndarray:
    """Assemble the global map (world frame) from the keyframe store —
    the publishGlobalMap analog (mO.cpp:784-826)."""
    import jax.numpy as jnp
    from . import se3
    kf = engine.map.kf
    n = int(kf.count)
    pts = []
    for i in range(n):
        T = np.asarray(se3.pose6_to_mat(kf.poses6[i]))
        for cloud, mask in ((kf.corner[i], kf.corner_mask[i]),
                            (kf.surf[i], kf.surf_mask[i])):
            p = np.asarray(cloud)[np.asarray(mask)]
            pts.append(p @ T[:3, :3].T + T[:3, 3])
    if not pts:
        return np.zeros((0, 3), np.float32)
    out = np.concatenate(pts)
    if len(out) > max_points:
        out = out[np.random.default_rng(0).permutation(len(out))[:max_points]]
    return out.astype(np.float32)
