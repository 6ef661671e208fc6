"""Closed-form symmetric 3x3 eigendecomposition vs jnp.linalg.eigh."""

import jax.numpy as jnp
import numpy as np

from sc_lego_loam_tpu.ops.solver import sym3_eig


def test_sym3_eig_matches_lapack():
    rng = np.random.default_rng(0)
    B = rng.normal(0, 1, (512, 3, 3)).astype(np.float32)
    A = B @ np.swapaxes(B, -1, -2)
    evals, vmax = sym3_eig(jnp.asarray(A))
    ref_w, ref_v = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(evals), ref_w, rtol=2e-4,
                               atol=2e-4)
    # Eigenvector up to sign: |v . ref| ~ 1.
    dots = np.abs(np.einsum("qi,qi->q", np.asarray(vmax), ref_v[:, :, 2]))
    # Degenerate (near-equal top eigenvalues) directions are arbitrary.
    gap = (ref_w[:, 2] - ref_w[:, 1]) / np.maximum(ref_w[:, 2], 1e-9)
    ok = gap > 1e-3
    assert (dots[ok] > 0.999).all()


def test_sym3_eig_line_cloud():
    """A near-collinear point cloud must yield a dominant eigenvalue with
    the line direction (the cornerOptimization use case)."""
    rng = np.random.default_rng(1)
    t = rng.normal(0, 1, (64, 5, 1)).astype(np.float32)
    dirv = np.array([0.6, 0.64, 0.48], np.float32)
    pts = t * dirv + rng.normal(0, 0.01, (64, 5, 3)).astype(np.float32)
    d = pts - pts.mean(1, keepdims=True)
    cov = np.einsum("qki,qkj->qij", d, d) / 5
    evals, vmax = sym3_eig(jnp.asarray(cov))
    assert (np.asarray(evals[:, 2]) > 3 * np.asarray(evals[:, 1])).all()
    dots = np.abs(np.asarray(vmax) @ dirv)
    assert (dots > 0.99).all()


def test_sym3_eig_isotropic():
    A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    evals, vmax = sym3_eig(A)
    np.testing.assert_allclose(np.asarray(evals), 2.5, atol=1e-5)
    assert np.isfinite(np.asarray(vmax)).all()
