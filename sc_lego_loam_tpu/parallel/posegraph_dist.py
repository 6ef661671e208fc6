"""Distributed pose-graph solve (BASELINE.json north star: the pose-graph
solve distributed over ICI collectives).

The solve itself lives in posegraph.solve: a Gauss-Newton step in relative
(edge) coordinates whose only super-linear work is the O(L K) edge-space
loop-Jacobian build and the (6L x 6K x 6L) capacitance contraction.  Those
are exactly the pieces a mesh shards: `solve_dist` passes the mesh through,
posegraph.solve annotates the loop bank and the (L,6,K,6) Ghat tensor with
a 'kf' PartitionSpec, and XLA GSPMD partitions the contractions and inserts
the ICI reduce — the idiomatic JAX scale-out (shardings + compiler
collectives, not hand-written NCCL; SURVEY.md par.2 communication row).

The chain linearization (O(K) 6x6 algebra) and the small capacitance solve
stay replicated: at SC-LeGO-LOAM scale they are microseconds, and
replicating them avoids a latency-bound sequential dependency across
devices.
"""

from __future__ import annotations

from ..config import PipelineConfig
from .. import posegraph


def solve_dist(config: PipelineConfig, mesh, poses6, count, odom_z, loops):
    """Mesh-sharded robust GN over the keyframe pose graph.

    Same contract as posegraph.solve; ``loops`` should be device_put with
    its leading (L) axis sharded over the mesh's 'kf' axis (a replicated
    bank also works — GSPMD resharding handles it)."""
    return posegraph.solve(config, poses6, count, odom_z, loops, mesh=mesh)
