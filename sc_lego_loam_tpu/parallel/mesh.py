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
