#!/usr/bin/env python
"""A/B: ring-blocked vs flat odometry NN latency on TPU (serialized scan)."""
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
    print(f"{name:42s} {(time.time()-t0)/n_rep/N*1e3:8.3f} ms/scan",
          flush=True)


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
    featsj = jax.tree.map(lambda *a: jnp.stack(a), *feats)

    # Ring-overflow check at full scale: counts per ring of less_flat.
    lf = feats[-1].less_flat
    ring = np.asarray(lf.ring)[np.asarray(lf.mask)]
    cnt = np.bincount(ring, minlength=base.lidar.n_scan)
    print(f"less_flat per-ring counts: max={cnt.max()} p95="
          f"{int(np.percentile(cnt, 95))} total={cnt.sum()}")
    ls = feats[-1].less_sharp
    ring = np.asarray(ls.ring)[np.asarray(ls.mask)]
    cnt = np.bincount(ring, minlength=base.lidar.n_scan)
    print(f"less_sharp per-ring counts: max={cnt.max()} total={cnt.sum()}")

    for it, re in [(12, 2), (12, 3), (8, 2), (8, 4)]:
        cfg = base.replace(odom=dataclasses.replace(
            base.odom, max_iterations=it,
            research_every=re, delta_rot_deg=0.0, delta_trans_cm=0.0))
        st0 = odometry.init_state(cfg)

        def b_odo(st, fs, cfg=cfg):
            ns, pose, xi = odometry.step(cfg, st, fs)
            return ns, None

        f = jax.jit(lambda c, x: jax.lax.scan(b_odo, c, x))
        timed(f"odometry it={it} re={re}", f, st0, featsj)


if __name__ == "__main__":
    main()
