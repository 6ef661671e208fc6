#!/usr/bin/env python
"""Diagnose figure-8 divergence: per-frame odometry twist error vs GT."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import frontend, odometry
from sc_lego_loam_tpu.ops import features as features_op
from sc_lego_loam_tpu.utils import synthetic, se3

cfg = tiny_test_config()
n = 60
scans, valids, gt = synthetic.make_sequence(
    cfg.lidar, n, trajectory="figure8", noise=0.01, seed=7,
    shuffle=not cfg.lidar.ordered, radius=30.0, loops=1.05)

state = odometry.init_state(cfg)
for i in range(n):
    fo = frontend.run(cfg, jnp.asarray(scans[i]), jnp.asarray(valids[i]))
    fs = features_op.extract(fo.cloud, cfg.feat, cfg.cap)
    state, pose, xi = odometry.step(cfg, state, fs)
    if i == 0:
        continue
    T_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
    xi_gt = np.asarray(se3.se3_log(jnp.asarray(T_gt, jnp.float32)))
    xi = np.asarray(xi)
    err = xi - xi_gt
    nsharp = int(fs.sharp.mask.sum()); nflat = int(fs.flat.mask.sum())
    print(f"{i:3d} gt_rot={np.degrees(np.linalg.norm(xi_gt[:3])):5.2f}deg "
          f"gt_t=({xi_gt[3]:6.3f},{xi_gt[4]:6.3f},{xi_gt[5]:6.3f}) "
          f"err_rot=({np.degrees(err[0]):6.3f},{np.degrees(err[1]):6.3f},{np.degrees(err[2]):6.3f})deg "
          f"err_t=({err[3]:6.3f},{err[4]:6.3f},{err[5]:6.3f}) "
          f"sharp={nsharp} flat={nflat}")
