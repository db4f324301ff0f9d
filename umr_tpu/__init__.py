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

import os as _os


def _init_compile_cache():
    """Enable JAX's persistent compilation cache for every entry point.

    First compiles over the tunneled TPU take minutes (the round-4 parity
    run paid 413 s before its first render); caching the serialized
    executables under cachedir/ makes every subsequent process (bench,
    evals, resumed runs) skip them. Disable with
    UMR_TPU_NO_COMPILE_CACHE=1; point elsewhere with UMR_TPU_COMPILE_CACHE.

    TPU-only on purpose: XLA:CPU serializes machine-feature-pinned AOT
    objects whose reload on this host logs cpu_aot_loader feature
    mismatches and risks SIGILL, so processes that force JAX_PLATFORMS=cpu
    (tests/conftest.py, __graft_entry__.dryrun_multichip) must not cache.
    """
    if _os.environ.get("UMR_TPU_NO_COMPILE_CACHE"):
        return
    if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        return
    try:
        import jax

        d = _os.environ.get(
            "UMR_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.dirname(__file__), _os.pardir,
                          "cachedir", "xla_cache"),
        )
        d = _os.path.abspath(d)
        _os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # optional fast path only — never block startup
        pass


_init_compile_cache()
