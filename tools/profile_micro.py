#!/usr/bin/env python
"""Micro-dissection of the hot stages: times sub-ops in isolation so the
round-3 perf work attacks the real costs (VERDICT.md round 2: every hot
kernel is latency/traffic-bound, far from roofline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.config import synthetic_config
from sc_lego_loam_tpu import frontend
from sc_lego_loam_tpu.ops import (features as features_op, ground, knn,
                                  pallas_knn, projection, segmentation,
                                  voxel)
from sc_lego_loam_tpu.models import scan_context
from sc_lego_loam_tpu.utils import synthetic


def bench(name, fn, *args, n=30, **kw):
    out = jax.jit(fn)(*args, **kw) if callable(fn) else None
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = jax.jit(fn)(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:44s} {dt:9.3f} ms")
    return out


def main():
    cfg = synthetic_config()
    print("backend:", jax.default_backend(), jax.devices())
    scans, valids, gt = synthetic.make_sequence(
        cfg.lidar, 2, trajectory="figure8", radius=30.0, loops=0.05,
        noise=0.01, seed=11, shuffle=False)
    pts = jnp.asarray(scans[-1]); msk = jnp.asarray(valids[-1])

    # -------- dispatch overhead --------
    x = jnp.zeros((8, 128), jnp.float32)
    bench("dispatch (x+1 tiny)", lambda a: a + 1.0, x, n=200)
    big = jnp.zeros((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    bench("copy 256MB (jnp.copy)", lambda a: a + 1.0, big, n=10)

    # -------- frontend pieces --------
    img = jax.jit(projection.project_ordered, static_argnums=2)(
        pts, msk, cfg.lidar)
    g = jax.jit(ground.ground_mask, static_argnums=(1, 2))(
        img, cfg.lidar, cfg.seg)
    bench("projection.project_ordered",
          lambda p, m: projection.project_ordered(p, m, cfg.lidar), pts, msk)
    bench("projection.project (unordered)",
          lambda p, m: projection.project(p, m, cfg.lidar), pts, msk)
    bench("ground.ground_mask",
          lambda i: ground.ground_mask(i, cfg.lidar, cfg.seg), img)
    bench("segmentation.segment (6 rounds)",
          lambda i, gg: segmentation.segment(i, gg, cfg.lidar, cfg.seg),
          img, g)
    import dataclasses
    seg3 = dataclasses.replace(cfg.seg, max_label_rounds=3)
    bench("segmentation.segment (3 rounds)",
          lambda i, gg: segmentation.segment(i, gg, cfg.lidar, seg3),
          img, g)
    s = jax.jit(segmentation.segment, static_argnums=(2, 3))(
        img, g, cfg.lidar, cfg.seg)
    from sc_lego_loam_tpu.ops import compaction
    bench("compaction.compact",
          lambda i, ss, gg: compaction.compact(i, ss, gg, cfg.lidar, cfg.seg),
          img, s, g)

    # -------- features pieces --------
    cloud, outlier = jax.jit(compaction.compact, static_argnums=(3, 4))(
        img, s, g, cfg.lidar, cfg.seg)
    bench("features.extract (full)",
          lambda c: features_op.extract(c, cfg.feat, cfg.cap), cloud)
    bench("features.curvature",
          lambda c: features_op.curvature(c, cfg.feat), cloud)

    # -------- odometry NN pieces --------
    Q, T = 2048, 4096
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 20, (Q, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 20, (T, 3)), jnp.float32)
    tmask = jnp.ones((T,), bool)
    tring = jnp.asarray(rng.integers(0, 64, (T,)), jnp.int32)
    qmask = jnp.ones((Q,), bool)
    from sc_lego_loam_tpu.ops.features import FeatureCloud
    fc = FeatureCloud(xyz=tgt, mask=tmask, ring=tring,
                      rel_time=jnp.zeros((T,), jnp.float32))
    from sc_lego_loam_tpu import odometry
    bench("odometry._find_corner (2048x4096)",
          lambda a, b: odometry._find_corner(a, qmask, b, cfg.odom), q, fc)
    bench("odometry._find_surf (2048x4096)",
          lambda a, b: odometry._find_surf(a, qmask, b, cfg.odom), q, fc)
    bench("sqdist only (2048x4096)",
          lambda a, b: odometry._sqdist(a, b).min(-1), q, tgt)

    # -------- scatter alternatives: SC descriptor --------
    bench("sc.make_descriptor (scatter, cur)",
          lambda p, m: scan_context.make_descriptor(p, m, cfg.sc), pts, msk)

    def desc_bcast(points, mask):
        sc = cfg.sc
        R, S = sc.num_ring, sc.num_sector
        if points.shape[0] > sc.max_input_points:
            stride = -(-points.shape[0] // sc.max_input_points)
            points = points[::stride]
            mask = mask[::stride]
        x, y, z = points[:, 0], points[:, 1], points[:, 2]
        rho = jnp.sqrt(x * x + y * y)
        theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0
        ok = mask & (rho < sc.max_radius) & (rho > 1e-3)
        ring = jnp.clip((rho / (sc.max_radius / R)).astype(jnp.int32),
                        0, R - 1)
        sector = jnp.clip((theta / (360.0 / S)).astype(jnp.int32), 0, S - 1)
        flat = jnp.where(ok, ring * S + sector, R * S)
        val = jnp.where(ok, z + sc.lidar_height, -1e9)
        n = points.shape[0]
        C = 16
        chunk = n // C
        fb = flat.reshape(C, 1, chunk)
        vb = val.reshape(C, 1, chunk)
        bins = jnp.arange(R * S)[None, :, None]
        m = jax.vmap(lambda f, v: jnp.where(f == bins[0], v, -1e9).max(-1))(
            fb, vb).max(0)
        return jnp.where(m <= -1e8, 0.0, m).reshape(R, S)

    d1 = bench("sc.descriptor (bcast-compare)", desc_bcast, pts, msk)
    d0 = jax.jit(lambda p, m: scan_context.make_descriptor(p, m, cfg.sc))(
        pts, msk)
    print("   bcast == scatter:",
          bool(jnp.allclose(jnp.asarray(d1), jnp.asarray(d0))))

    # -------- voxel decimate alternatives --------
    M = 50 * 14336
    big_pts = jnp.asarray(rng.normal(0, 40, (M, 3)), jnp.float32)
    big_mask = jnp.asarray(rng.random(M) > 0.2)
    bench("voxel_decimate (717k, cur C=16)",
          lambda p, m: voxel.voxel_decimate(p, m, 0.3, 65536),
          big_pts, big_mask, n=10)

    def thin_group(points, mask, out_pad):
        Mm = points.shape[0]
        gsz = -(-Mm // out_pad)
        pad = gsz * out_pad - Mm
        p = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
        mk = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
        pg = p.reshape(out_pad, gsz, 3)
        mg = mk.reshape(out_pad, gsz)
        i = jnp.argmax(mg, -1)
        ok = jnp.take_along_axis(mg, i[:, None], -1)[:, 0]
        out = jnp.take_along_axis(pg, i[:, None, None], 1)[:, 0]
        return jnp.where(ok[:, None], out, 0.0), ok

    bench("thin_group (717k -> 65536)", lambda p, m: thin_group(p, m, 65536),
          big_pts, big_mask, n=10)

    # -------- pallas knn --------
    q2 = jnp.asarray(rng.normal(0, 20, (12288, 3)), jnp.float32)
    t2 = jnp.asarray(rng.normal(0, 20, (65536, 3)), jnp.float32)
    t2m = jnp.ones((65536,), bool)
    bench("pallas_knn 12288x65536 k=5",
          lambda a, b, m: pallas_knn.knn_pallas(a, b, m, k=5, max_sq_dist=4.0),
          q2, t2, t2m, n=10)
    q3 = jnp.asarray(rng.normal(0, 20, (8192, 3)), jnp.float32)
    t3 = jnp.asarray(rng.normal(0, 20, (32768, 3)), jnp.float32)
    t3m = jnp.ones((32768,), bool)
    bench("pallas_knn 8192x32768 k=1",
          lambda a, b, m: pallas_knn.knn_pallas(a, b, m, k=1, max_sq_dist=64.0),
          q3, t3, t3m, n=10)

    # -------- se3 svd best-fit (ICP inner) --------
    from sc_lego_loam_tpu.utils import se3
    w = jnp.ones((8192,), jnp.float32)
    bench("se3.best_fit_transform (8192)",
          lambda a, b: se3.best_fit_transform(a, b, w), q3, q3 + 0.01)


if __name__ == "__main__":
    main()
