"""PCR block-tridiagonal solver vs dense reference solve."""

import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.ops.tridiag import block_tridiag_solve


def _random_spd_tridiag(K, b, rng):
    """SPD block-tridiagonal system (diagonally dominant)."""
    L = rng.normal(0, 0.3, (K, b, b)).astype(np.float32)
    D = np.zeros((K, b, b), np.float32)
    for k in range(K):
        A = rng.normal(0, 1, (b, b)).astype(np.float32)
        D[k] = A @ A.T + (2.0 + 2 * b) * np.eye(b, dtype=np.float32)
    U = np.zeros((K, b, b), np.float32)
    U[:-1] = np.swapaxes(L[1:], -1, -2)   # symmetric: U[k] = L[k+1]^T
    L[0] = 0.0
    return D, L, U


def _dense(D, L, U):
    K, b, _ = D.shape
    H = np.zeros((K * b, K * b), np.float64)
    for k in range(K):
        H[k*b:(k+1)*b, k*b:(k+1)*b] = D[k]
        if k > 0:
            H[k*b:(k+1)*b, (k-1)*b:k*b] = L[k]
        if k < K - 1:
            H[k*b:(k+1)*b, (k+1)*b:(k+2)*b] = U[k]
    return H


def test_pcr_matches_dense():
    rng = np.random.default_rng(0)
    for K in (1, 2, 3, 7, 16, 33, 64):
        D, L, U = _random_spd_tridiag(K, 6, rng)
        B = rng.normal(0, 1, (K, 6, 3)).astype(np.float32)
        u = np.asarray(block_tridiag_solve(
            jnp.asarray(D), jnp.asarray(L), jnp.asarray(U), jnp.asarray(B)))
        H = _dense(D, L, U)
        ref = np.linalg.solve(H, B.reshape(K * 6, 3))
        np.testing.assert_allclose(u.reshape(K * 6, 3), ref,
                                   rtol=2e-3, atol=2e-3)


def test_pcr_block_diagonal_limit():
    """With zero couplings PCR must reduce to independent block solves."""
    rng = np.random.default_rng(1)
    K, b = 12, 6
    D, _, _ = _random_spd_tridiag(K, b, rng)
    Z = np.zeros((K, b, b), np.float32)
    B = rng.normal(0, 1, (K, b, 2)).astype(np.float32)
    u = np.asarray(block_tridiag_solve(
        jnp.asarray(D), jnp.asarray(Z), jnp.asarray(Z), jnp.asarray(B)))
    for k in range(K):
        np.testing.assert_allclose(u[k], np.linalg.solve(D[k], B[k]),
                                   rtol=1e-4, atol=1e-4)
