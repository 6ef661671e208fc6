#!/usr/bin/env python
"""True serialized-latency profile of the perception stages.

The axon TPU runtime overlaps independent dispatches and its
block_until_ready does not await execution (only a host value fetch
does), so naive microbenchmarks are meaningless.  This tool measures each
stage as a lax.scan over N distinct scans inside ONE jit with a chained
carry — pure device latency, zero dispatch overhead, no overlap.
"""

import functools
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
from sc_lego_loam_tpu import frontend, odometry, pipeline
from sc_lego_loam_tpu.ops import features as features_op
from sc_lego_loam_tpu.utils import synthetic

N = 16


def timed_scan(name, body, carry0, xs, n_rep=3):
    """body(carry, x) -> (carry, None); prints per-iteration latency."""
    f = jax.jit(lambda c, x: jax.lax.scan(body, c, x))
    out, _ = f(carry0, xs)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]      # true sync
    t0 = time.time()
    for _ in range(n_rep):
        out, _ = f(carry0, xs)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / n_rep / N * 1e3
    print(f"{name:42s} {dt:8.3f} ms/scan", flush=True)
    return dt


def main():
    cfg = synthetic_config()
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        cfg.lidar, N, trajectory="figure8", radius=30.0, loops=0.15,
        noise=0.01, seed=11, shuffle=False)
    xs = (jnp.asarray(scans), jnp.asarray(valids))

    def chain(pts, c):
        return pts + 0.0 * c                     # serialize on carry

    def b_frontend(c, x):
        p, m = x
        fo = frontend.run(cfg, chain(p, c), m)
        return fo.cloud.rng.sum(), None

    def b_feat(c, x):
        p, m = x
        fo = frontend.run(cfg, chain(p, c), m)
        fs, _, _, _ = pipeline._extract(cfg, fo.cloud, fo.outlier)
        return fs.less_flat.xyz.sum(), None

    def b_percep(st, x):
        p, m = x
        ns, pose, op, om = pipeline._odo_perception(cfg, p, m, st)
        return ns, None

    from sc_lego_loam_tpu.ops import ground, projection, segmentation

    def b_proj(c, x):
        p, m = x
        img = projection.project_ordered(chain(p, c), m, cfg.lidar)
        return img.rng.sum(), None

    def b_seg(c, x):
        p, m = x
        img = projection.project_ordered(chain(p, c), m, cfg.lidar)
        g = ground.ground_mask(img, cfg.lidar, cfg.seg)
        s = segmentation.segment(img, g, cfg.lidar, cfg.seg)
        return s.label.sum().astype(jnp.float32), None

    timed_scan("projection", b_proj, jnp.float32(0), xs)
    timed_scan("proj+ground+segmentation", b_seg, jnp.float32(0), xs)
    timed_scan("frontend.run", b_frontend, jnp.float32(0), xs)
    timed_scan("frontend+features", b_feat, jnp.float32(0), xs)
    st0 = odometry.init_state(cfg)
    timed_scan("perception (frontend+feat+odometry)", b_percep, st0, xs)

    # odometry alone: precompute features for all scans, chain state.
    feats = []
    for i in range(N):
        fo = frontend.run(cfg, xs[0][i], xs[1][i])
        fs, _, _, _ = pipeline._extract(cfg, fo.cloud, fo.outlier)
        feats.append(fs)
    feats = jax.tree.map(lambda *a: jnp.stack(a), *feats)

    def b_odo(st, fs):
        ns, pose, xi = odometry.step(cfg, st, fs)
        return ns, None

    timed_scan("odometry.step", b_odo, st0, feats)

    # ---- mapping / loop stages, chained through a real warm engine state.
    eng = pipeline.SlamEngine(cfg)
    for i in range(N):
        pose = eng.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    from sc_lego_loam_tpu import loop, mapping, posegraph
    class _St:  # compat view over the split engine states
        pass
    st = _St()
    st.odo, st.map, st.bank, st.loops = eng.odo, eng.map, eng.bank, eng.loops
    st.sub_c, st.sub_cm, st.sub_s, st.sub_sm = mapping.build_submap(
        eng.config, eng.map.kf)
    from sc_lego_loam_tpu import loop, mapping, posegraph
    from sc_lego_loam_tpu.models import scan_context
    from sc_lego_loam_tpu.utils import se3

    c, cm, s, sm, o, om = mapping.downsample_scan(
        cfg, st.odo.corner_last.xyz, st.odo.corner_last.mask,
        st.odo.surf_last.xyz, st.odo.surf_last.mask,
        jnp.zeros((cfg.cap.outlier_pad, 3)),
        jnp.zeros((cfg.cap.outlier_pad,), bool))
    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])

    def b_s2m(T, _):
        Tn = mapping.scan_to_map(cfg, T, c, cm, surf_q, surf_qm,
                                 st.sub_c, st.sub_cm, st.sub_s, st.sub_sm)
        return Tn, None

    dummy = jnp.zeros((N, 1))
    timed_scan("mapping.scan_to_map", b_s2m, st.map.pose, dummy)

    def b_ds(carry, _):
        cc, ccm, ss, ssm, oo, oom = mapping.downsample_scan(
            cfg, st.odo.corner_last.xyz + 0.0 * carry,
            st.odo.corner_last.mask, st.odo.surf_last.xyz,
            st.odo.surf_last.mask, jnp.zeros((cfg.cap.outlier_pad, 3)),
            jnp.zeros((cfg.cap.outlier_pad,), bool))
        return cc.sum(), None

    timed_scan("mapping.downsample_scan", b_ds, jnp.float32(0), dummy)

    def b_submap(carry, _):
        kf2 = st.map.kf._replace(
            poses6=st.map.kf.poses6 + 0.0 * carry)
        sub = mapping.build_submap(cfg, kf2)
        return sub[0].sum(), None

    timed_scan("mapping.build_submap", b_submap, jnp.float32(0), dummy)

    def b_desc(carry, x):
        p, m = x
        d = scan_context.make_descriptor(chain(p, carry), m, cfg.sc)
        return d.sum(), None

    timed_scan("sc.make_descriptor", b_desc, jnp.float32(0), xs)

    def b_detect(carry, _):
        bank2 = st.bank._replace(desc=st.bank.desc + 0.0 * carry)
        i, d, y = scan_context.detect(cfg, bank2, st.bank.desc[0])
        return d, None

    timed_scan("sc.detect (K bank)", b_detect, jnp.float32(0), dummy)

    cur = jnp.maximum(st.map.kf.count - 1, 0)

    def b_hist(carry, _):
        c, kf = carry
        kf2 = kf._replace(poses6=kf.poses6 + 0.0 * c)
        pts, mk = loop.history_submap(cfg, kf2, jnp.int32(0))
        return (pts.sum(), kf), None

    # kf rides in the carry: a closure-captured keyframe store becomes a
    # ~700 MB constant in the compile request (the tunnel rejects it).
    timed_scan("loop.history_submap", b_hist,
               (jnp.float32(0), st.map.kf), dummy)

    place = se3.pose6_to_mat(st.map.kf.poses6[0])

    def b_verify(carry, _):
        c, kf = carry
        kf2 = kf._replace(poses6=kf.poses6 + 0.0 * c)
        Z, fit, ok = loop.verify(cfg, kf2, cur, jnp.int32(0), place)
        return (fit, kf), None

    timed_scan("loop.verify (ICP)", b_verify,
               (jnp.float32(0), st.map.kf), dummy)

    def b_pg(carry, _):
        c, p6, odz, lps = carry
        out = posegraph.solve(cfg, p6 + 0.0 * c, st.map.kf.count, odz, lps)
        return (out.sum(), p6, odz, lps), None

    timed_scan("posegraph.solve", b_pg,
               (jnp.float32(0), st.map.kf.poses6, st.map.kf.odom_z,
                st.loops), dummy)


if __name__ == "__main__":
    main()
