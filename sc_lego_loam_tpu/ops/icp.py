"""Point-to-point ICP for loop-closure verification (replaces
pcl::IterativeClosestPoint used at mapOptmization.cpp:1006-1011,1054-1059).

Jitted fixed-shape loop: 1-NN correspondences by brute-force MXU tiles,
closed-form SVD rigid fit per iteration (the same estimator PCL uses
internally), convergence on the increment twist norm.  Fitness matches
pcl::Registration::getFitnessScore — the mean squared nearest-neighbor
distance of the aligned source (mO.cpp:1020,1071 gate it at < 1.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from .knn import nn1
from . import pallas_knn
from ..utils import se3


def _make_nn1(dst, dst_mask):
    """1-NN closure: fused Pallas kernel on TPU (loop-invariant target prep
    hoisted — the (T,3) transpose dominates a single query), XLA elsewhere.
    max_sq_dist 64 keeps quantization fine enough for the fitness gate;
    1-NN through the chunk-candidate kernel is exact."""
    if jax.default_backend() == "tpu":
        prep = pallas_knn.prepare_targets(dst, dst_mask)

        def nn(p, qcnt=None):
            idx, sqd = pallas_knn.knn_pallas_prepared(p, prep, k=1,
                                                      max_sq_dist=64.0,
                                                      qcnt=qcnt)
            return idx[:, 0], sqd[:, 0]

        return nn
    return lambda p, qcnt=None: nn1(p, dst, dst_mask)


@functools.partial(jax.jit, static_argnums=0)
def align(config: PipelineConfig, src: jnp.ndarray, src_mask: jnp.ndarray,
          dst: jnp.ndarray, dst_mask: jnp.ndarray,
          T0: jnp.ndarray | None = None):
    """Align src onto dst. Returns (T (4,4), fitness (), inlier_ratio ())
    with dst ~ T @ src for matched points.

    ``inlier_ratio`` = fraction of valid source points whose aligned NN
    distance is below ``loop.inlier_sq_dist`` — the overlap statistic the
    acceptance gate uses beside mean-square fitness.  The reference's lone
    ``fitness < 1.5`` gate (mO.cpp:1020,1071) passes alignments where a
    minority of points match well and the rest sit meters off (its
    measured loop precision is ~0.69); a mean can be dragged under the
    threshold by easy ground points while walls misalign."""
    lcfg = config.loop
    if T0 is None:
        T0 = jnp.eye(4, dtype=jnp.float32)
    # Prefix-compact the source once: the Pallas 1-NN then skips query
    # tiles past the live count (loop.keyframe_cloud pads run ~30-60%).
    from .compact import compact
    src, src_mask = compact(src, src_mask, src.shape[0])
    qcnt = src_mask.sum().astype(jnp.int32)[None]
    nn = _make_nn1(dst, dst_mask)

    def iteration(T):
        p = se3.transform_points(T, src[None])[0]
        idx, sqd = nn(p, qcnt)
        w = src_mask.astype(jnp.float32)
        dT = se3.best_fit_transform(p, dst[idx], w)
        done = jnp.linalg.norm(se3.se3_log(dT)) < lcfg.icp_eps
        return done, dT @ T

    # Unrolled with lax.cond-gated iterations, NOT lax.while_loop: a
    # scan/while containing a dot_general permanently degrades all
    # subsequent dispatches on this runtime (see odometry._stage_loop).
    T = T0
    done = jnp.bool_(False)
    for _ in range(lcfg.icp_max_iterations):
        done, T = jax.lax.cond(
            done, lambda t: (jnp.bool_(True), t), iteration, T)

    p = se3.transform_points(T, src[None])[0]
    _, sqd = nn(p, qcnt)
    w = src_mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    fitness = (sqd * w).sum() / denom
    inlier_ratio = ((sqd < lcfg.inlier_sq_dist) * w).sum() / denom
    return T, fitness, inlier_ratio
