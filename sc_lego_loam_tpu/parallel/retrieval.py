"""Sharded Scan Context retrieval (the BASELINE.json "batched
descriptor-distance matmul sharded over hosts").

The descriptor bank's K axis is split over the 'kf' mesh axis; each shard
computes the all-shift cosine-distance block against the (replicated) query
on its own MXU, reduces to a local (best_dist, best_idx, best_shift), and a
single psum-style all-gather picks the global argmin — O(K/d) work per
device, one tiny collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PipelineConfig
from ..models import scan_context

_BIG = 1e9   # python float (module-level jnp constants poison the stream)


def _local_best(config, query, desc_shard, base_idx, count, exclude_lo):
    """Best match within one bank shard. Returns (dist, idx, shift)."""
    d = scan_context.distance_all_shifts(query, desc_shard)   # (Ks, S)
    dist_k = d.min(-1)
    shift_k = jnp.argmin(d, -1)
    Ks = desc_shard.shape[0]
    ids = base_idx + jnp.arange(Ks)
    eligible = ids < exclude_lo
    dist_k = jnp.where(eligible, dist_k, _BIG)
    b = jnp.argmin(dist_k)
    return dist_k[b], ids[b], shift_k[b]


@functools.partial(jax.jit, static_argnums=(0, 1))
def detect_sharded(config: PipelineConfig, mesh: Mesh, bank_desc, count,
                   query_desc):
    """Sharded equivalent of models.scan_context.detect.

    bank_desc: (K, R, S) sharded over 'kf' on its leading axis.
    Returns (best_idx or -1, best_dist, yaw)."""
    sc = config.sc
    n_shards = mesh.shape["kf"]
    K = bank_desc.shape[0]
    Ks = K // n_shards
    exclude_lo = count - sc.exclude_recent

    def shard_fn(desc_shard):
        i = jax.lax.axis_index("kf")
        dist, idx, shift = _local_best(config, query_desc, desc_shard,
                                       i * Ks, count, exclude_lo)
        # All-gather the per-shard winners; every shard computes the argmin.
        dists = jax.lax.all_gather(dist, "kf")
        idxs = jax.lax.all_gather(idx, "kf")
        shifts = jax.lax.all_gather(shift, "kf")
        b = jnp.argmin(dists)
        return dists[b], idxs[b], shifts[b]

    best_dist, best_idx, best_shift = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P("kf"),
        out_specs=P(), check_vma=False,
    )(bank_desc)

    ok = best_dist < sc.dist_threshold
    yaw = best_shift.astype(jnp.float32) * (2.0 * jnp.pi / sc.num_sector)
    return jnp.where(ok, best_idx, -1), best_dist, yaw
