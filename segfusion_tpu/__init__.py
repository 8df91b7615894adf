"""SegFusion-TPU: TPU-native online joint 3D reconstruction + semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`suryanshkumar/online-joint-depthfusion-and-semantic` (ICRA/RA-L 2022):
given a stream of noisy depth maps, camera poses and RGB frames it

  (a) predicts per-frame 2D semantic labels with a multimodal AdapNet++ CNN,
  (b) learns to fuse depth frames into a global TSDF voxel volume with a 2D
      fusion network (de-routed RoutedFusion), and
  (c) fuses the semantic labels into a voxel-aligned label/score volume,

producing per-scene TSDF + semantic volumes, marching-cubes meshes and
geometry/semantic metrics.

Architecture stance (TPU-first, not a port):
  * scene state (tsdf/weights/semantic ids/scores) is a device-resident pytree
    threaded through a jitted ``step(state, frame) -> state`` with donated
    buffers -- no host<->device volume copies per frame,
  * extraction is a batched trilinear gather, integration a deterministic
    scatter-add / packed scatter-max, both with static shapes (masking instead
    of boolean indexing),
  * models are Flax modules in NHWC layout,
  * multi-device scaling uses jax.sharding Mesh + NamedSharding (data parallel
    segmentation training, scene-parallel fusion), not NCCL/DataParallel.
"""

__version__ = "0.1.0"
