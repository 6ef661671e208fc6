"""High-rate pose fusion (reference C21: transformFusion.cpp).

The reference's fourth ROS node re-applies the latest mapping correction to
every 10 Hz odometry pose (transformFusion.cpp:94-179, duplicating the
Euler machinery of mapOptmization.cpp:397-482).  With poses as matrices it
is one multiply: fused = correction @ odom_pose."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def fuse(correction: jnp.ndarray, odom_pose: jnp.ndarray) -> jnp.ndarray:
    return correction @ odom_pose
