"""mofo_tpu: a TPU-native JAX framework for motion-focused self-supervised
video understanding (MOFO / VideoMAE family).

Rebuilt from scratch for TPU (jax / XLA / Pallas / pjit). Capability parity
target: the Moohnai/MOFO reference (VideoMAE fork). See SURVEY.md at the repo
root for the full component inventory this package covers.

Layout:
  core/      config dataclasses, constants, distributed init, RNG streams
  models/    ViT primitives, pretrain MAE, classifiers (incl. BB-focused)
  ops/       masking, patchify/targets, attention kernels, image/augment ops
  parallel/  device mesh + sharding rules (dp / fsdp / tp)
  train/     optimizer factory, schedules, train states & jitted steps
  data/      file lists, frame samplers, video decode, host->TPU pipeline
  eval/      multi-view test aggregation, EK-100 marginalization
  cli/       runner entry points (pretrain / finetune / tools)
  factory/   offline data factory (optical flow -> motion maps -> boxes)
"""

from mofo_tpu.version import __version__

__all__ = ["__version__"]
