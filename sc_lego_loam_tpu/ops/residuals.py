"""Point-to-line and point-to-plane residual geometry.

Reference: edge residual = |(p-a) x (p-b)| / |a-b| (featureAssociation.cpp:
1106-1152), plane residual = (p-a) . n / |n| with n = (b-a) x (c-a)
(fA.cpp:1228-1267).  Used by both scan-to-scan and scan-to-map solvers.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def point_to_line(p, a, b):
    """Unsigned distance from p to the line through a, b. Batched (...,3)."""
    pa = p - a
    pb = p - b
    cr = jnp.cross(pa, pb)
    num = jnp.linalg.norm(cr, axis=-1)
    den = jnp.linalg.norm(a - b, axis=-1)
    return num / jnp.maximum(den, _EPS)


def point_to_plane(p, a, b, c):
    """Signed distance from p to the plane through a, b, c. Batched (...,3)."""
    n = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(n, axis=-1)
    return jnp.sum((p - a) * n, -1) / jnp.maximum(nn, _EPS)


def point_to_plane_nd(p, normal, d):
    """Signed distance to a plane given unit normal + offset (n.x + d)."""
    return jnp.sum(p * normal, -1) + d
