"""lvio_fusion_tpu — TPU-native multi-sensor fusion SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jypjypjypjyp/lvio_fusion (stereo-visual + LiDAR + IMU + GNSS odometry with
pose-graph loop closure and TD3-adaptive factor weighting).

Design pillars (vs. the reference's C++/ROS/Ceres architecture):
  * pure-functional fixed-shape state pytrees instead of a mutex-guarded Map
  * a batched Levenberg-Marquardt solver with Schur-complement landmark
    marginalization instead of Ceres
  * vectorized / Pallas image & point-cloud kernels instead of OpenCV/PCL
  * a native JAX TD3 agent instead of the ROS-service PyTorch sidecar
  * multi-chip scaling via jax.sharding Mesh + shard_map (DP over RL envs,
    batched factor evaluation sharded over ICI)
"""

__version__ = "0.1.0"
