"""Eager replay of scan_to_map's GN loop with per-iteration prints."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from sc_lego_loam_tpu.config import tiny_test_config
from sc_lego_loam_tpu.mapping import _corner_geometry, _surf_geometry, _transform
from sc_lego_loam_tpu.ops import solver
from sc_lego_loam_tpu.utils import se3

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_mapping import _make_scene

cfg = tiny_test_config()
m = cfg.mapping
rng = np.random.default_rng(1)
surf_map, corner_map = _make_scene(rng, n_surf=8192, n_corner=1024)
cap = cfg.cap
sub_s = np.zeros((cap.submap_surf_pad, 3), np.float32); sub_s[:len(surf_map)] = surf_map
sub_sm = np.zeros(cap.submap_surf_pad, bool); sub_sm[:len(surf_map)] = True
sub_c = np.zeros((cap.submap_corner_pad, 3), np.float32); sub_c[:len(corner_map)] = corner_map
sub_cm = np.zeros(cap.submap_corner_pad, bool); sub_cm[:len(corner_map)] = True

xi_true = np.array([0.01, -0.02, 0.03, 0.2, -0.1, 0.05], np.float32)
T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
Tinv = np.linalg.inv(T_true)
def to_sensor(p): return (p @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)

cq = np.zeros((cap.kf_corner_pad, 3), np.float32); cqm = np.zeros(cap.kf_corner_pad, bool)
sel_c = rng.permutation(len(corner_map))[:200]
cq[:200] = to_sensor(corner_map[sel_c]); cqm[:200] = True
nsq = cap.kf_surf_pad + cap.kf_outlier_pad
sq = np.zeros((nsq, 3), np.float32); sqm = np.zeros(nsq, bool)
sel_s = rng.permutation(len(surf_map))[:1000]
sq[:1000] = to_sensor(surf_map[sel_s]); sqm[:1000] = True

corner_q, corner_qmask = jnp.asarray(cq), jnp.asarray(cqm)
surf_q, surf_qmask = jnp.asarray(sq), jnp.asarray(sqm)
submap_c, submap_cm = jnp.asarray(sub_c), jnp.asarray(sub_cm)
submap_s, submap_sm = jnp.asarray(sub_s), jnp.asarray(sub_sm)

T = jnp.eye(4, dtype=jnp.float32)
Pm = jnp.eye(6); degen = False
for it in range(10):
    pc_w = _transform(T, corner_q)
    ps_w = _transform(T, surf_q)
    la, lb, c_ok = _corner_geometry(pc_w, submap_c, submap_cm, m)
    nu, dof, s_ok = _surf_geometry(ps_w, submap_s, submap_sm, m)
    c_ok &= corner_qmask
    s_ok &= surf_qmask

    def resid(delta):
        Td = se3.se3_exp(delta) @ T
        pc = _transform(Td, corner_q)
        ps = _transform(Td, surf_q)
        pa, pb = pc - la, pc - lb
        cr = jnp.cross(pa, pb)
        rc = jnp.linalg.norm(cr, axis=-1) / jnp.maximum(
            jnp.linalg.norm(la - lb, axis=-1), 1e-9)
        rs = jnp.einsum("qi,qi->q", ps, nu) + dof
        return jnp.concatenate([rc, rs])

    delta0 = jnp.zeros((6,), jnp.float32)
    r = resid(delta0)
    J = jax.jacfwd(resid)(delta0)
    nq = corner_q.shape[0]
    wc = solver.robust_weight(jnp.abs(r[:nq]), m.robust_slope, m.robust_min_weight, True)
    depth = jnp.linalg.norm(surf_q, axis=-1)
    ws_raw = 1.0 - m.robust_slope * jnp.abs(r[nq:]) / jnp.sqrt(jnp.maximum(depth, 1e-6))
    ws = jnp.where(ws_raw > m.robust_min_weight, ws_raw, 0.0)
    w = jnp.concatenate([wc * c_ok, ws * s_ok])
    n_sel = int((w > 0).sum())
    delta, H, _ = solver.gauss_newton_step(J, r, w, damping=1e-6)
    evals = np.linalg.eigvalsh(np.asarray(H))
    Pm_new, degen_new = solver.degeneracy_projector(H, m.eig_threshold)
    if it == 0:
        Pm, degen = Pm_new, bool(degen_new)
    if degen:
        delta = Pm @ delta
    T = se3.se3_exp(delta) @ T
    err = np.linalg.norm(np.asarray(T)[:3, 3] - T_true[:3, 3])
    print(f"it{it}: c_ok={int(c_ok.sum())} s_ok={int(s_ok.sum())} n_sel={n_sel} "
          f"|r|w={float((jnp.abs(r)*w).sum()/max(n_sel,1)):.4f} "
          f"|delta|={float(jnp.linalg.norm(delta)):.5f} degen={degen} "
          f"eigs={evals[:3].round(1)} err_t={err:.4f}")
print("T_true t:", T_true[:3, 3], " T_est t:", np.asarray(T)[:3, 3])
