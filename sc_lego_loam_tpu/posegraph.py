"""Pose-graph optimization on SE(3) (reference C14: the GTSAM/iSAM2 layer,
mapOptmization.cpp:241-244, 1525-1664).

From-scratch robust Gauss-Newton replacing gtsam::ISAM2:
- nodes: keyframe poses (fixed-capacity bank, masked by count);
- factors: one prior on node 0 (mO.cpp:1544-1551), between factors linking
  consecutive keyframes (mO.cpp:1552-1560), and Cauchy-robust loop factors
  (mO.cpp:990-997 robustNoiseModel with Cauchy(1), variance 0.5);
- residual of a between factor (i,j,Z): log(Z^-1 Xi^-1 Xj); per-factor
  6x12 Jacobians via vmapped jax.jacfwd through the se(3) exponential,
  scatter-assembled into dense block normal equations (the exact sparsity
  pattern a distributed Schur-complement solve partitions over hosts);
- IRLS: Cauchy weights recomputed from the current residual each iteration;
- batch re-solve on loop closure (the reference's incremental iSAM2 update
  reduces to this: without loops the odometry chain is already the exact
  solution, and ``correctPoses`` only fires after a loop, mO.cpp:1642-1664).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .utils import se3


class LoopFactors(NamedTuple):
    """Fixed-capacity loop-factor store."""

    i: jnp.ndarray        # (L,) int32 — newer keyframe index
    j: jnp.ndarray        # (L,) int32 — older keyframe index
    z: jnp.ndarray        # (L,4,4) measured Xi^-1 Xj
    count: jnp.ndarray    # () int32


def init_loops(config: PipelineConfig, max_loops: int | None = None
               ) -> LoopFactors:
    if max_loops is None:
        max_loops = config.posegraph.max_loops
    return LoopFactors(
        i=jnp.zeros((max_loops,), jnp.int32),
        j=jnp.zeros((max_loops,), jnp.int32),
        z=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                           (max_loops, 4, 4)).copy(),
        count=jnp.int32(0),
    )


@jax.jit
def add_loop(loops: LoopFactors, i, j, z,
             poses6: jnp.ndarray | None = None) -> LoopFactors:
    """Append a loop factor.  Past capacity a slot must be evicted; note
    that ``solve`` is a full batch re-solve where the poses are only the
    INITIALIZATION, so an evicted factor's constraint does NOT persist —
    at the next re-solve the stiff odometry chain (var 1e-6) pulls any
    region constrained only by the dropped factor back toward open-loop.
    Eviction policy therefore targets the LOWEST-INFORMATION factor: with
    ``poses6`` (the current keyframe estimates) the overwritten slot is
    the factor with the largest residual under the current solution — the
    most Cauchy-downweighted one, i.e. either a spurious factor or one the
    graph already cannot satisfy; revisit regions covered by many mutually
    consistent factors keep their constraints.  Without ``poses6`` the
    slot index ring-wraps (oldest-out) as a fallback.  ``count`` keeps
    growing — active factors = min(count, L); overflow is host-detectable
    as count > L (pipeline._check_caps)."""
    L = loops.i.shape[0]
    k_ring = loops.count % L
    if poses6 is None:
        k = k_ring
    else:
        K = poses6.shape[0]
        li = jnp.clip(loops.i, 0, K - 1)
        lj = jnp.clip(loops.j, 0, K - 1)
        Xi = se3.pose6_to_mat(poses6[li])
        Xj = se3.pose6_to_mat(poses6[lj])
        r = jax.vmap(lambda a, b, c: se3.se3_log(
            se3.mat_inv(c) @ se3.mat_inv(a) @ b))(Xi, Xj, loops.z)
        worst = jnp.argmax(jnp.linalg.norm(r, axis=-1))
        k = jnp.where(loops.count >= L, worst.astype(jnp.int32), k_ring)
    return LoopFactors(
        i=loops.i.at[k].set(i), j=loops.j.at[k].set(j),
        z=loops.z.at[k].set(z),
        count=loops.count + 1,
    )


def _factor_residual(dij, Xi, Xj, Z):
    """Residual of one between factor with local updates dij = [di, dj]."""
    Xi2 = se3.se3_exp(dij[:6]) @ Xi
    Xj2 = se3.se3_exp(dij[6:]) @ Xj
    return se3.se3_log(se3.mat_inv(Z) @ se3.mat_inv(Xi2) @ Xj2)


@functools.partial(jax.jit, static_argnums=(0, 7))
def solve(config: PipelineConfig, poses6: jnp.ndarray, count: jnp.ndarray,
          odom_z: jnp.ndarray, loops: LoopFactors,
          node_mask: jnp.ndarray | None = None,
          free_edges: jnp.ndarray | None = None,
          mesh=None):
    """Robust GN re-solve of the full graph.

    poses6: (K,6) current keyframe pose estimates (initialization);
    odom_z: (K,4,4) — odom_z[k] = measured X_{k-1}^-1 X_k for k >= 1;
    odom_z[0] holds the prior pose of node 0.
    Returns optimized poses6 (K,6).

    Multi-chain graphs (merge_solve, BASELINE.json config 4): ``node_mask``
    (K,) overrides the count-prefix active set, and ``free_edges`` (F,)
    lists nodes that begin a new sequence — their incoming odometry factor
    carries no information (it merely parametrizes the chain's placement,
    which cross-sequence loop factors then determine) and is solved as an
    explicit unknown of the capacitance system rather than through 1/lambda
    (which would amplify f32 error by the inverse stiffness).

    ``mesh`` (static, optional): a Mesh with a 'kf' axis.  The loop-factor
    bank inputs (i, j, z) are sharding-annotated over 'kf'; under GSPMD the
    L-proportional per-factor work (residuals/Jacobians/Q builds and the
    L x L capacitance assembly) distributes across devices, while the
    K-proportional cumsum/associative-scan contractions follow the sharding
    of the (replicated or kf-sharded) pose bank, with XLA inserting the ICI
    collectives (the BASELINE.json "distributed pose-graph solve" —
    sharding annotations + compiler-inserted collectives, not hand-written
    NCCL).  The dense (6L)^2 capacitance solve itself stays replicated.

    Scalability & conditioning: each GN step is solved in RELATIVE (edge)
    coordinates.  With w_0 = Jp u_0 and w_k = Ji_k u_{k-1} + Jj_k u_k (the
    linearized odometry-factor increments), the chain part of the normal
    equations becomes exactly DIAGONAL — Lambda = diag(per-dim factor
    weights) — and loop factors stay a rank-6L correction handled by the
    Woodbury identity with a small (6L x 6L) capacitance solve.  The
    node<->edge map u_k = Phi_k sum_{m<=k} Phi_m^{-1} Jtil_m w_m uses one
    associative scan of 6x6 adjoint-like blocks (log K depth).

    Why this formulation: the reference's odometry variances (1e-6/1e-8,
    mO.cpp:368-371) give the node-space Hessian a ~1e8 condition number —
    gtsam factorizes it in f64 on the CPU; no f32 factorization (dense,
    block-Thomas, or cyclic reduction, all measured) survives it.  In edge
    coordinates the stiffness is inverted ANALYTICALLY per element, so f32
    is exact where it matters; the remaining dense solve (capacitance) is
    I + O(small) and well-conditioned.  Work is O(K (6L)^2) per iteration
    with K-way parallelism and never materializes a (6K)^2 matrix — K=4096
    solves fit real-time budgets where the dense Hessian alone is 2.4 GB.
    """
    pg = config.posegraph
    K = poses6.shape[0]
    L = loops.i.shape[0]
    node_ok = node_mask if node_mask is not None else (jnp.arange(K) < count)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard_l = NamedSharding(mesh, P("kf"))
        loops = LoopFactors(
            i=jax.lax.with_sharding_constraint(loops.i, shard_l),
            j=jax.lax.with_sharding_constraint(loops.j, shard_l),
            z=jax.lax.with_sharding_constraint(
                loops.z, NamedSharding(mesh, P("kf", None, None))),
            count=loops.count)
    if free_edges is None:
        free_edges = jnp.zeros((0,), jnp.int32)
    F = free_edges.shape[0]
    chain_starts = jnp.zeros((K,), bool).at[free_edges].set(
        True, mode="drop")

    w_prior = 1.0 / jnp.sqrt(jnp.asarray(pg.prior_var, jnp.float32))
    w_odom = 1.0 / jnp.sqrt(jnp.asarray(pg.odom_var, jnp.float32))
    w_loop = 1.0 / jnp.sqrt(jnp.float32(config.loop.loop_noise_var))
    c2 = jnp.float32(config.loop.cauchy_k) ** 2

    odom_ok = node_ok[1:].astype(jnp.float32)  # factor k-1 valid iff node k is
    loop_ok = (jnp.arange(L) < loops.count).astype(jnp.float32)
    li = jnp.clip(loops.i, 0, K - 1)
    lj = jnp.clip(loops.j, 0, K - 1)

    zero12 = jnp.zeros((12,), jnp.float32)
    zero6 = jnp.zeros((6,), jnp.float32)
    r_fn = jax.vmap(_factor_residual, in_axes=(None, 0, 0, 0))
    J_fn = jax.vmap(jax.jacfwd(_factor_residual), in_axes=(None, 0, 0, 0))
    eyeL = jnp.eye(6 * L, dtype=jnp.float32)

    def gn_iter(X):

        # ---- linearize: odometry chain (factor f couples nodes f, f+1) --
        r = r_fn(zero12, X[:-1], X[1:], odom_z[1:])      # (K-1,6)
        J = J_fn(zero12, X[:-1], X[1:], odom_z[1:])      # (K-1,6,12)
        Ji, Jj = J[:, :, :6], J[:, :, 6:]                # unweighted

        # Prior on node 0 (anchors the gauge, mO.cpp:1544-1551).
        rp = se3.se3_log(se3.mat_inv(odom_z[0]) @ X[0])
        Jp = jax.jacfwd(
            lambda d: se3.se3_log(
                se3.mat_inv(odom_z[0]) @ se3.se3_exp(d) @ X[0]))(zero6)

        # ---- edge coordinates: w_0 = Jp u_0, w_k = Ji_k u_{k-1} + Jj_k u_k
        # u_k = Phi_k sum_{m<=k} Psi_m w_m with Phi the prefix product of
        # A_k = -Jj_k^{-1} Ji_k and Psi_m = Phi_m^{-1} Jtil_m.
        Jj_inv = jnp.linalg.inv(Jj)                      # (K-1,6,6)
        A = jnp.concatenate([
            jnp.eye(6, dtype=jnp.float32)[None],
            -(Jj_inv @ Ji)], 0)                          # (K,6,6)
        Jtil = jnp.concatenate([jnp.linalg.inv(Jp)[None], Jj_inv], 0)
        Phi = jax.lax.associative_scan(
            lambda a, b: jnp.einsum("...ij,...jk->...ik", b, a), A)
        Psi = jnp.linalg.inv(Phi) @ Jtil                 # (K,6,6)

        # Diagonal edge-space information (per-dim weights squared).
        lam_odom = jnp.where(odom_ok[:, None] > 0, w_odom[None, :] ** 2,
                             1e3)                        # freeze inactive
        bnd = chain_starts[1:]
        lam = jnp.concatenate([(w_prior ** 2)[None, :], lam_odom], 0)
        lam = lam + pg.damping                           # (K,6)
        r_hat = jnp.concatenate(
            [rp[None],
             r * (odom_ok[:, None] > 0) * (~bnd[:, None])], 0)

        # ---- loop factors: Cauchy-robust rows in edge space -------------
        rl = r_fn(zero12, X[li], X[lj], loops.z)         # (L,6)
        Jl = J_fn(zero12, X[li], X[lj], loops.z)         # (L,6,12)
        e2 = ((rl * w_loop) ** 2).sum(-1)
        w_c = jnp.sqrt(c2 / (c2 + e2)) * loop_ok * w_loop  # (L,)
        rlw = rl * w_c[:, None]
        Qi = (Jl[:, :, :6] * w_c[:, None, None]) @ Phi[li]
        Qj = (Jl[:, :, 6:] * w_c[:, None, None]) @ Phi[lj]

        # ---- normal equations in w: (Lambda + G^T G) w = -(Lambda r + G^T rl)
        # Solved in the "loop residual" variable v = rlw + G w, which keeps
        # every quantity O(residual): w = -r_hat - Lambda^{-1} G^T v and
        # (I + G Lambda^{-1} G^T) v = rlw - G r_hat.
        #
        # G is NEVER materialized (a dense (6L,6K) Ghat is 600 MB at the
        # 16k-keyframe / 256-loop capacity and killed the TPU compiler):
        # every contraction with G uses its prefix structure
        #   G_l x = Qi_l sum_{k<=li} P_k x_k + Qj_l sum_{k<=lj} P_k x_k,
        # so  G r_hat  needs one (K,6) cumsum gathered at li/lj,
        #     G L^-1 G^T needs the cumsum W_m = sum_{k<=m} P_k invL_k P_k^T
        #       of (6,6) blocks gathered at pairwise min indices, and
        #     G^T v needs a scatter-add of Q^T v at li/lj + one reverse
        #       cumsum.  O(36 K + 144 L^2) memory instead of O(36 L K).
        inv_lam = 1.0 / lam                              # (K,6)
        if F:
            inv_lam = inv_lam.at[free_edges].set(0.0)    # stiff part only

        Pinv = Psi * inv_lam[:, None, :]                 # P_k invL_k
        W = jnp.cumsum(jnp.einsum("kab,kcb->kac", Pinv, Psi), 0)  # (K,6,6)
        C = jnp.cumsum(jnp.einsum("kab,kb->ka", Psi, r_hat), 0)   # (K,6)

        # rhs1_l = rlw_l - Qi_l C_{li} - Qj_l C_{lj}
        rhs1 = (rlw - jnp.einsum("lab,lb->la", Qi, C[li])
                - jnp.einsum("lab,lb->la", Qj, C[lj])).reshape(-1)

        # M11 = I + sum over the 4 (Qi/Qj x Qi/Qj) terms of
        #   Q_l W_{min(idx_l, idx_m)} Q_m^T.
        def term(Qa, ia, Qb, ib):
            Wg = W[jnp.minimum(ia[:, None], ib[None, :])]   # (L,L,6,6)
            return jnp.einsum("lab,lmbc,mdc->lamd", Qa, Wg, Qb)

        M11 = (term(Qi, li, Qi, li) + term(Qi, li, Qj, lj)
               + term(Qj, lj, Qi, li) + term(Qj, lj, Qj, lj)
               ).reshape(6 * L, 6 * L) + eyeL
        if F:
            # Gf[:, f] = Qi_l P_f [f<=li] + Qj_l P_f [f<=lj]   (6L, 6F)
            Pf = Psi[free_edges]                         # (F,6,6)
            mi = (free_edges[None, :] <= li[:, None]).astype(jnp.float32)
            mj = (free_edges[None, :] <= lj[:, None]).astype(jnp.float32)
            Gf = (jnp.einsum("lab,fbc->lafc", Qi, Pf) * mi[:, None, :, None]
                  + jnp.einsum("lab,fbc->lafc", Qj, Pf)
                  * mj[:, None, :, None]).reshape(6 * L, 6 * F)
            Aug = jnp.block(
                [[M11, -Gf],
                 [Gf.T, pg.damping * jnp.eye(6 * F, dtype=jnp.float32)]])
            sol = jnp.linalg.solve(
                Aug, jnp.concatenate([rhs1, jnp.zeros((6 * F,),
                                                      jnp.float32)]))
            v, wf = sol[:6 * L], sol[6 * L:]
        else:
            v = jnp.linalg.solve(M11, rhs1)
            wf = jnp.zeros((0,), jnp.float32)

        # (G^T v)_k = P_k^T * suffix-sum_k( scatter(Q^T v at li/lj) ).
        vL = v.reshape(L, 6)
        u = jnp.zeros((K, 6), jnp.float32)
        u = u.at[li].add(jnp.einsum("lba,lb->la", Qi, vL), mode="drop")
        u = u.at[lj].add(jnp.einsum("lba,lb->la", Qj, vL), mode="drop")
        S = jnp.cumsum(u[::-1], 0)[::-1]                 # suffix-inclusive
        Gtv = jnp.einsum("kba,kb->ka", Psi, S)
        w_sol = -r_hat - inv_lam * Gtv
        if F:
            w_sol = w_sol.at[free_edges].set(wf.reshape(F, 6))

        # ---- back to node space: u_k = Phi_k cumsum(Psi_m w_m) -----------
        t = jnp.cumsum(jnp.einsum("kab,kb->ka", Psi, w_sol), axis=0)
        upd = jnp.einsum("kab,kb->ka", Phi, t)

        upd = jnp.where(jnp.isfinite(upd), upd, 0.0)
        upd = upd * node_ok[:, None]

        # Backtracking on the robust cost: GN + IRLS can overshoot and
        # oscillate when a loop factor demands a large rigid correction
        # (the Cauchy weight swings with the residual); take the best of a
        # few step scales, 0 included, so every iteration is monotone.
        def total_cost(Xc):
            rr = r_fn(zero12, Xc[:-1], Xc[1:], odom_z[1:])
            rpp = se3.se3_log(se3.mat_inv(odom_z[0]) @ Xc[0])
            rh = jnp.concatenate(
                [rpp[None],
                 rr * (odom_ok[:, None] > 0) * (~bnd[:, None])], 0)
            c_odom = (lam * rh * rh).sum()
            rll = r_fn(zero12, Xc[li], Xc[lj], loops.z)
            e2l = ((rll * w_loop) ** 2).sum(-1)
            c_loop = (c2 * jnp.log1p(e2l / c2) * loop_ok).sum()
            return c_odom + c_loop

        scales = jnp.array([0.0, 0.1, 0.25, 0.5, 1.0], jnp.float32)
        costs = jax.vmap(
            lambda s: total_cost(se3.se3_exp(s * upd) @ X))(scales)
        s_best = scales[jnp.argmin(costs)]
        upd = s_best * upd
        X = se3.se3_exp(upd) @ X
        return jnp.linalg.norm(upd) <= 1e-4, X

    # Unrolled with lax.cond-gated iterations, NOT lax.while_loop: a
    # scan/while containing a dot_general permanently degrades every
    # subsequent dispatch on this runtime (see odometry._stage_loop) —
    # and this solve runs inside loop_step, so one while-based re-solve
    # would poison the whole engine's dispatch stream.
    X = se3.pose6_to_mat(poses6)
    done = jnp.bool_(False)
    for _ in range(pg.max_gn_iterations):
        done, X = jax.lax.cond(
            done, lambda x: (jnp.bool_(True), x), gn_iter, X)
    out = se3.mat_to_pose6(X)
    return jnp.where(node_ok[:, None], out, poses6)
