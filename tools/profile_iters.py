#!/usr/bin/env python
"""Iteration-cost decomposition for the odometry and mapping LM loops.

Times odometry.step / mapping.scan_to_map across (max_iterations,
research_every) grids on the serialized lax.scan harness; the slope wrt
iterations gives per-iteration solve cost, the slope wrt researches gives
per-research NN cost, and the intercept gives fixed overhead.
"""

import dataclasses
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
from sc_lego_loam_tpu.utils import synthetic

N = 8


def timed(name, f, carry0, xs, n_rep=3):
    out, _ = f(carry0, xs)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(n_rep):
        out, _ = f(carry0, xs)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / n_rep / N * 1e3
    print(f"{name:46s} {dt:8.3f} ms/scan", flush=True)
    return dt


def main():
    base = synthetic_config()
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        base.lidar, N, trajectory="figure8", radius=30.0, loops=0.1,
        noise=0.01, seed=11, shuffle=False)
    xs = (jnp.asarray(scans), jnp.asarray(valids))

    feats = []
    for i in range(N):
        fo = frontend.run(base, xs[0][i], xs[1][i])
        fs, _, _, _ = pipeline._extract(base, fo.cloud, fo.outlier)
        feats.append(fs)
    feats = jax.tree.map(lambda *a: jnp.stack(a), *feats)

    # Odometry sweep: disable early exit by setting tight convergence.
    for it, re in [(15, 2), (15, 5), (15, 15), (8, 2), (8, 4), (8, 8),
                   (4, 2), (4, 4), (2, 2), (1, 1)]:
        cfg = base.replace(odom=dataclasses.replace(
            base.odom, max_iterations=it, research_every=re,
            delta_rot_deg=0.0, delta_trans_cm=0.0))
        st0 = odometry.init_state(cfg)

        def b_odo(st, fs, cfg=cfg):
            ns, pose, xi = odometry.step(cfg, st, fs)
            return ns, None

        f = jax.jit(lambda c, x: jax.lax.scan(b_odo, c, x))
        timed(f"odometry it={it} re={re}", f, st0, feats)

    # Mapping sweep on a warm engine state.
    from sc_lego_loam_tpu import mapping
    eng = pipeline.SlamEngine(base)
    for i in range(N):
        eng.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    class _St:  # compat view over the split engine states
        pass
    st = _St()
    st.odo, st.map, st.bank, st.loops = eng.odo, eng.map, eng.bank, eng.loops
    st.sub_c, st.sub_cm, st.sub_s, st.sub_sm = mapping.build_submap(
        eng.config, eng.map.kf)
    c, cm, s, sm, o, om = mapping.downsample_scan(
        base, st.odo.corner_last.xyz, st.odo.corner_last.mask,
        st.odo.surf_last.xyz, st.odo.surf_last.mask,
        jnp.zeros((base.cap.outlier_pad, 3)),
        jnp.zeros((base.cap.outlier_pad,), bool))
    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])
    dummy = jnp.zeros((N, 1))

    for it, re in [(8, 3), (8, 8), (8, 1), (4, 2), (4, 4), (2, 2), (1, 1)]:
        cfg = base.replace(mapping=dataclasses.replace(
            base.mapping, max_iterations=it, research_every=re,
            delta_rot_deg=0.0, delta_trans_cm=0.0))

        def b_s2m(T, _, cfg=cfg):
            Tn = mapping.scan_to_map(cfg, T, c, cm, surf_q, surf_qm,
                                     st.sub_c, st.sub_cm, st.sub_s, st.sub_sm)
            return Tn, None

        f = jax.jit(lambda c_, x: jax.lax.scan(b_s2m, c_, x))
        timed(f"scan_to_map it={it} re={re}", f, st.map.pose, dummy)


if __name__ == "__main__":
    main()
