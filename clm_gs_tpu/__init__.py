"""clm_gs_tpu — a TPU-native 3D Gaussian Splatting training framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of nyu-systems/CLM-GS
(see SURVEY.md): a tile-based differentiable rasterizer, three memory-placement
strategies (``no_offload``, ``naive_offload``, ``clm_offload``), visibility-driven
camera ordering, host-DRAM streaming of spherical-harmonic coefficients with an
eager host-side Adam, adaptive densification, COLMAP/MatrixCity data pipelines,
and multi-chip sharding over a ``jax.sharding.Mesh`` (a capability the single-GPU
reference does not have).

Package layout:
  ops/        projection, SH eval, tile binning, Pallas rasterizer, SSIM, KNN
  models/     Gaussian state pytree, densification, PLY/checkpoint IO
  strategies/ no_offload / naive_offload / clm_offload training engines
  data/       COLMAP + MatrixCity readers, cameras, predecoded dataset cache
  parallel/   mesh construction and sharded train steps
  utils/      schedules, math helpers, timers, structured logging
"""

__version__ = "0.1.0"
