"""Block-tridiagonal solver via parallel cyclic reduction (PCR).

The pose-graph normal equations of a SLAM chain are block-tridiagonal
(odometry between-factors couple only adjacent keyframes); loop closures
add a low-rank correction handled by Woodbury in posegraph.solve.  The
reference hands this structure to gtsam::ISAM2 on the CPU
(mapOptmization.cpp:241-244); a dense solve is O(K^3) and its (6K)^2
Hessian alone is 2.4 GB at K=4096.

PCR solves the block system in ceil(log2 K) rounds of batched 6x6 algebra
(every equation eliminates its distance-s neighbors simultaneously, s
doubling each round), i.e. O(K log K) work with K-way parallelism — the
TPU-native shape: ~12 rounds of (K,6,6) batched matmuls instead of a
sequential block-Thomas scan or an O(K^3) dense factorization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv6(A):
    """Batched 6x6 inverse. A: (K,6,6)."""
    return jnp.linalg.inv(A)


def block_tridiag_solve(D, L, U, B):
    """Solve the block-tridiagonal system

        L[k] u[k-1] + D[k] u[k] + U[k] u[k+1] = B[k],   k = 0..K-1

    with L[0] and U[K-1] ignored (treated as zero).

    D: (K,b,b) diagonal blocks (must be invertible; add damping upstream),
    L: (K,b,b) sub-diagonal blocks (coupling to k-1),
    U: (K,b,b) super-diagonal blocks (coupling to k+1),
    B: (K,b,R) right-hand sides.
    Returns u: (K,b,R).
    """
    K = D.shape[0]
    ids = jnp.arange(K)
    # Zero the out-of-range couplings explicitly.
    L = L.at[0].set(0.0)
    U = U.at[K - 1].set(0.0)

    rounds = max(1, (K - 1).bit_length())

    def body(r, carry):
        D, L, U, B = carry
        s = jnp.int32(1) << r
        Dinv = _inv6(D)

        def shift(x, sh):
            return jnp.roll(x, sh, axis=0)

        has_m = (ids - s) >= 0          # neighbor k-s exists
        has_p = (ids + s) < K           # neighbor k+s exists
        Dinv_m = shift(Dinv, s)
        Dinv_p = shift(Dinv, -s)
        alpha = jnp.where(has_m[:, None, None], -(L @ Dinv_m), 0.0)
        beta = jnp.where(has_p[:, None, None], -(U @ Dinv_p), 0.0)

        D2 = D + alpha @ shift(U, s) + beta @ shift(L, -s)
        B2 = B + alpha @ shift(B, s) + beta @ shift(B, -s)
        L2 = alpha @ shift(L, s)
        U2 = beta @ shift(U, -s)
        return D2, L2, U2, B2

    D, L, U, B = jax.lax.fori_loop(0, rounds, body, (D, L, U, B))
    return _inv6(D) @ B
