"""TPU-native medical image segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
QingYunA/General-Medical-Image-Segmentation-CNN-Framework (PyTorch/CUDA):
a config-driven train/predict harness around a 3-D + 2-D model zoo for
volumetric medical image segmentation.

Layer map (TPU-first, cf. reference SURVEY.md §1):

  CLI shims          train.py / predict.py        (repo root)
  Drivers            .train / .predict
  Config             .config                      (mini-Hydra: YAML groups + dotted overrides)
  Data pipeline      .data                        (pure-python NIfTI/MHD I/O, threaded patch queue)
  Model zoo          .models                      (Flax linen, NDHWC channels-last)
  Shared blocks      .nn                          (conv blocks, torch-parity BatchNorm, attention)
  Kernels            .ops                         (Pallas fused kernels, sliding-window scan)
  Parallelism        .parallel                    (Mesh + NamedSharding; sync-BN == global batch stats)
  Persistence        .checkpoint                  (msgpack {params, opt_state, epoch} with torch-ckpt semantics)

Everything hot runs under one `jax.jit` per shape: the train step
(fwd+loss+grad+update+metric) and the whole-volume sliding-window predict
(tile scan + overlap blend) are single XLA programs.
"""

__version__ = "0.1.0"

# Short alias used throughout docs/tests: `import gmist`
