"""sc_lego_loam_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
tiev-tongji/SC-LeGO-LOAM (see SURVEY.md for the structural analysis of the
reference).  No ROS/PCL/GTSAM/OpenCV: the four reference ROS nodes collapse
into pure jitted stage functions over fixed-shape arrays, composed by a thin
host pipeline; keyframe/descriptor banks shard over TPU meshes.
"""

from .config import (  # noqa: F401
    PipelineConfig, LidarConfig, default_config, vlp16_config,
    tiny_test_config, PRESETS,
)

__version__ = "0.1.0"
