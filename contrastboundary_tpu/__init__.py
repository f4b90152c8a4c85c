"""contrastboundary_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
point-cloud semantic segmentation with Contrastive Boundary Learning (CBL).

Re-designed from scratch for TPU with the capabilities of
LiyaoTang/contrastBoundary (CVPR 2022). Everything is fixed-shape and
batch-dense (`[B, N, ...]`) so XLA sees static shapes end to end; the
multi-resolution neighbor-index pyramid is built on device; data parallelism
is batch-sharded `jit` over a `jax.sharding.Mesh`.

Layout:
  core/      shadow-gather / masked-reduction primitives
  ops/       device kernels: knn, sampling (FPS/bucketed), voxelize, interpolation
  models/    backbones (point-transformer, ConvNet/resnet) + heads
  losses/    CBL contrast losses + segmentation losses
  data/      S3DIS pipeline: ingest, augment, crop/pad, batching
  config/    config tree + the reference's op-string DSL
  train/     train state, schedules, trainer loop, checkpointing
  eval/      metrics (mIoU/OA/mACC), voting inference, boundary protocol
  parallel/  mesh + sharding helpers
"""

__version__ = "0.1.0"
