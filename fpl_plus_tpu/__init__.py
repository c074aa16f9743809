"""fpl_plus_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
FPL+ (Filtered Pseudo Label-based UDA for 3D medical image segmentation) and its
underlying PyMIC toolkit.

The compute path is JAX (jit/pjit/shard_map + Pallas kernels); the runtime around
it (NIfTI codec hot paths, geodesic distance transforms, connected components)
has C++ implementations under :mod:`fpl_plus_tpu.native`.

Layer map (mirrors reference layers L0-L10, see SURVEY.md):
  config/      INI-compatible experiment configuration (L9)
  io/          image codecs + CSV-manifest datasets + prefetching loader (L1)
  transforms/  sample-dict transform pipeline with recorded inverses (L2)
  models/      Flax networks incl. DSBN variants (L3)
  losses/      segmentation / classification losses (L4)
  engine/      jit-compiled train/infer/fpl engines (L5/L6 compute)
  agents/      orchestration agents: supervised, dsbn (FPL+), ssl, wsl, nll (L5)
  parallel/    mesh / sharding utilities (multi-chip scale-out)
  metrics/     evaluation metrics + eva_main-style CSV reports (L7)
  utils/       post-processing, image ops, ramps, misc (shared)
  cli.py       command-line entry points (L8)
"""

__version__ = "0.1.0"
