"""radardistill_tpu — TPU-native (JAX/XLA/Pallas) RadarDistill framework.

A from-scratch re-design of RadarDistill (CVPR'24, radar-only 3D detection on
nuScenes via cross-modal distillation from a frozen LiDAR teacher), built for
TPU: static shapes, masked-dense sparse-conv semantics, a single jitted
train step, and shard_map data parallelism over a device mesh.

Reference implementation surveyed in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
