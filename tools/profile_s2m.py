#!/usr/bin/env python
"""Decompose mapping.scan_to_map research cost: knn vs gather+fits vs the
LM iteration chain — after the solve_spd / cond-eigh fixes."""
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
from sc_lego_loam_tpu import frontend, mapping, odometry, pipeline
from sc_lego_loam_tpu.ops import pallas_knn
from sc_lego_loam_tpu.utils import synthetic

N = 8


def timed(name, f, carry0, xs, n_rep=3):
    out, _ = f(carry0, xs)
    jax.block_until_ready(out)   # no transfers: see PERF.md transfer cliff
    t0 = time.time()
    for _ in range(n_rep):
        out, _ = f(carry0, xs)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n_rep/N*1e3:8.3f} ms/it",
          flush=True)


def main():
    base = synthetic_config()
    print("backend:", jax.default_backend())
    scans, valids, _ = synthetic.make_sequence(
        base.lidar, N, trajectory="figure8", radius=30.0, loops=0.1,
        noise=0.01, seed=11, shuffle=False)
    xs = (jnp.asarray(scans), jnp.asarray(valids))
    eng = pipeline.SlamEngine(base)
    for i in range(N):
        eng.process_scan(xs[0][i], xs[1][i], t=i * 0.1)
    class _St:  # compat view over the split engine states
        pass
    st = _St()
    st.odo, st.map, st.bank, st.loops = eng.odo, eng.map, eng.bank, eng.loops
    st.sub_c, st.sub_cm, st.sub_s, st.sub_sm = mapping.build_submap(
        eng.config, eng.map.kf)
    m = base.mapping
    c, cm, s, sm, o, om = mapping.downsample_scan(
        base, st.odo.corner_last.xyz, st.odo.corner_last.mask,
        st.odo.surf_last.xyz, st.odo.surf_last.mask,
        jnp.zeros((base.cap.outlier_pad, 3)),
        jnp.zeros((base.cap.outlier_pad,), bool))
    surf_q = jnp.concatenate([s, o])
    surf_qm = jnp.concatenate([sm, om])
    dummy = jnp.zeros((N, 1))
    T0 = st.map.pose

    sub_c, sub_cm, sub_s, sub_sm = st.sub_c, st.sub_cm, st.sub_s, st.sub_sm
    print("submap sizes:", sub_c.shape, sub_s.shape,
          int(sub_cm.sum()), int(sub_sm.sum()))

    knn_c = mapping._make_knn5(sub_c, sub_cm, m)
    knn_s = mapping._make_knn5(sub_s, sub_sm, m)

    def chain(x, c):
        return x + 0.0 * c

    def b_knn_s(carry, _):
        q = mapping._transform(T0, chain(surf_q, carry))
        idx, sqd = knn_s(q)
        return sqd.sum(), None

    def b_knn_c(carry, _):
        q = mapping._transform(T0, chain(c, carry))
        idx, sqd = knn_c(q)
        return sqd.sum(), None

    def b_gather_s(carry, _):
        q = mapping._transform(T0, chain(surf_q, carry))
        nu, dof, ok = mapping._surf_geometry(q, sub_s, knn_s, None, m)
        return nu.sum(), None

    def b_gather_c(carry, _):
        q = mapping._transform(T0, chain(c, carry))
        a, b, ok = mapping._corner_geometry(q, sub_c, knn_c, None, m)
        return a.sum(), None

    f = lambda body: jax.jit(lambda cr, x: jax.lax.scan(body, cr, x))
    timed("knn surf (12288 x 64k)", f(b_knn_s), jnp.float32(0), dummy)
    timed("knn corner (2048 x 16k)", f(b_knn_c), jnp.float32(0), dummy)
    timed("surf geometry (knn+gather+fit)", f(b_gather_s), jnp.float32(0),
          dummy)
    timed("corner geometry (knn+gather+eig)", f(b_gather_c), jnp.float32(0),
          dummy)

    for it, re in [(8, 3), (8, 8), (1, 1)]:
        cfg = base.replace(mapping=dataclasses.replace(
            base.mapping, max_iterations=it, research_every=re,
            delta_rot_deg=0.0, delta_trans_cm=0.0))

        def b_s2m(T, _, cfg=cfg):
            Tn = mapping.scan_to_map(cfg, T, c, cm, surf_q, surf_qm,
                                     sub_c, sub_cm, sub_s, sub_sm)
            return Tn, None

        timed(f"scan_to_map it={it} re={re}", f(b_s2m), T0, dummy)

    # Odometry after solver fixes.
    feats = []
    for i in range(N):
        fo = frontend.run(base, xs[0][i], xs[1][i])
        fs, _, _, _ = pipeline._extract(base, fo.cloud, fo.outlier)
        feats.append(fs)
    featsj = jax.tree.map(lambda *a: jnp.stack(a), *feats)
    for it, re in [(15, 2), (15, 5), (8, 4)]:
        cfg = base.replace(odom=dataclasses.replace(
            base.odom, max_iterations=it, research_every=re,
            delta_rot_deg=0.0, delta_trans_cm=0.0))
        st0 = odometry.init_state(cfg)

        def b_odo(stt, fs, cfg=cfg):
            ns, pose, xi = odometry.step(cfg, stt, fs)
            return ns, None

        timed(f"odometry it={it} re={re}", f(b_odo), st0, featsj)


if __name__ == "__main__":
    main()
