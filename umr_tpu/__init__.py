"""umr_tpu — a TPU-native (JAX/Flax/Pallas) framework for self-supervised
single-view 3D mesh reconstruction, with the capabilities of NVlabs/UMR.

Layer map (mirrors the reference's six layers, re-designed TPU-first):

  experiments/   entry points: train_s1, train_s2, avg_uv, test_kp, test_iou, demo
  training/      Trainer/Tester harness, optimizer schedules, checkpointing
  models/        Flax modules: MeshNet (s1/s2), discriminator+GRL, LPIPS AlexNet
  losses/        pure-function loss library (mask/texture/cycle/part/chamfer/...)
  renderer/      functional soft renderer (camera transform + lighting + rasterizer)
  ops/           compute kernels: soft rasterizer (XLA reference + Pallas TPU),
                 grid_sample, quaternions, chamfer, mesh regularizers
  mesh/          host-side mesh construction: icosphere, symmetry split, UV sampler
  data/          CUB data pipeline (host numpy/cv2), synthetic data for tests
  parallel/      jax.sharding mesh helpers, shard_map data-parallel train steps
  utils/         image ops, transformations, logging
"""

__version__ = "0.1.0"
