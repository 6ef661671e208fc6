"""Eager replay of the odometry two-stage LM on frame 1."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu import frontend
from sc_lego_loam_tpu.ops import features as F
from sc_lego_loam_tpu.ops import solver
from sc_lego_loam_tpu.odometry import (_find_surf, _find_corner, _deskew,
                                       _surf_residual, _corner_residual)
from sc_lego_loam_tpu.utils import se3, synthetic

cfg = tiny_test_config()
ocfg = cfg.odom
scans, valids, poses = synthetic.make_sequence(
    cfg.lidar, 2, trajectory="straight", step=0.3, yaw_rate=0.02,
    noise=0.005, seed=5)

def feats(i):
    fo = frontend.run(cfg, jnp.asarray(scans[i]), jnp.asarray(valids[i]))
    return F.extract(fo.cloud, cfg.feat, cfg.cap)

fs0, fs1 = feats(0), feats(1)
flat = fs1.flat._replace(rel_time=jnp.ones_like(fs1.flat.rel_time))
sharp = fs1.sharp._replace(rel_time=jnp.ones_like(fs1.sharp.rel_time))
surf_t, corner_t = fs0.less_flat, fs0.less_sharp

T_gt = np.linalg.inv(poses[0]) @ poses[1]
xi_gt = np.asarray(se3.se3_log(jnp.asarray(T_gt)))
print("gt xi:", xi_gt.round(4))

xi = jnp.zeros(6)
# Stage 1: surf [0,1,5]
for stage, idxs in (("surf", (0, 1, 5)), ("corner", (2, 3, 4))):
    idx = jnp.asarray(idxs)
    corres = None
    Pm = jnp.eye(3); degen = False
    for it in range(10):
        if it % ocfg.research_every == 0:
            if stage == "surf":
                q = _deskew(xi, flat.xyz, flat.rel_time)
                corres = _find_surf(q, flat.mask, surf_t, ocfg)
            else:
                q = _deskew(xi, sharp.xyz, sharp.rel_time)
                corres = _find_corner(q, sharp.mask, corner_t, ocfg)
        if stage == "surf":
            j, l2, l3, valid = corres
            def r_of(x):
                return _surf_residual(x, flat.xyz, flat.rel_time,
                                      surf_t.xyz[j], surf_t.xyz[l2],
                                      surf_t.xyz[l3])
        else:
            j, l2, valid = corres
            def r_of(x):
                return _corner_residual(x, sharp.xyz, sharp.rel_time,
                                        corner_t.xyz[j], corner_t.xyz[l2])
        r = r_of(xi)
        J = jax.jacfwd(r_of)(xi)
        w = solver.robust_weight(jnp.abs(r), ocfg.robust_slope,
                                 ocfg.robust_min_weight,
                                 it >= ocfg.robust_after_iter)
        w = w * valid
        J3 = J[:, idx]
        delta3, H, _ = solver.gauss_newton_step(J3, r, w, damping=1e-6)
        Pm_new, degen_new = solver.degeneracy_projector(H, ocfg.eig_threshold)
        if it == 0:
            Pm, degen = Pm_new, bool(degen_new)
        if degen:
            delta3 = Pm @ delta3
        evals = np.linalg.eigvalsh(np.asarray(H))
        delta6 = jnp.zeros(6).at[idx].set(delta3)
        xi = xi + delta6
        print(f"{stage} it{it}: nvalid={int(valid.sum())} "
              f"|r|={float((jnp.abs(r)*w).sum()/max(float(w.sum()),1)):.4f} "
              f"delta={np.asarray(delta3).round(5)} degen={degen} "
              f"eig={evals.round(1)} xi={np.asarray(xi).round(4)}")
        if bool(solver.converged(delta6[:3], delta6[3:], ocfg.delta_rot_deg,
                                 ocfg.delta_trans_cm)):
            print(f"{stage} converged at it{it}")
            break
print("final xi:", np.asarray(xi).round(4), " gt:", xi_gt.round(4))
