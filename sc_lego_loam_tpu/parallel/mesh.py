"""Device mesh construction for the sharded engine.

The reference's "distribution" is four single-machine ROS processes
(SURVEY.md par.1); the TPU-native scale-out instead shards the keyframe /
descriptor banks and the pose-graph factor set over a jax.sharding.Mesh,
with XLA collectives over ICI (SURVEY.md par.2 parallelism checklist).

Axes:
  kf    — keyframe/descriptor bank shards (tensor-parallel retrieval,
          distributed pose graph)
  seq   — data-parallel sequences (multi-sequence batch mapping,
          BASELINE.json config 4)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host bring-up: initialize jax.distributed so jax.devices()
    spans every host's chips, then build meshes as usual (collectives ride
    ICI within a slice, DCN across slices — the multi-host configs of
    BASELINE.json).

    With no arguments the standard env vars apply
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod auto-detection).  Safe to call on a single host: if no
    coordinator is configured it is a no-op.  Returns the global device
    count.
    """
    coordinator = coordinator or __import__("os").environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return len(jax.devices())


def make_mesh(n_kf: int | None = None, n_seq: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_kf is None:
        n_kf = len(devices) // n_seq
    devs = np.asarray(devices[:n_kf * n_seq]).reshape(n_seq, n_kf)
    return Mesh(devs, axis_names=("seq", "kf"))


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Keyframe/descriptor banks: leading K axis split over 'kf'."""
    return NamedSharding(mesh, P("kf"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
