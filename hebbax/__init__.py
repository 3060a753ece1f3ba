"""hebbax — TPU-native (JAX/XLA/Pallas) framework for Hebbian-bootstrapped
semi-supervised medical image segmentation.

A ground-up rebuild of the capabilities of
ciampluca/hebbian-bootstraping-semi-supervised-medical-imaging (PyTorch,
single-GPU) as an idiomatic JAX framework: functional Hebbian plasticity
rules fused into jitted train steps, SPMD data parallelism over a device
mesh, and a sharded sliding-window 3D evaluator.

Layer map (mirrors reference SURVEY.md section 1):
  config/   dataset constants, ramps, LR schedules
  data/     2D folder datasets + 3D volume patch pipeline (host-side numpy)
  models/   Flax model zoo (UNet/VNet families, SNN, DDPM, RAD-DINO head)
  hebb/     functional Hebbian plasticity engine (swta/hpca/contrastive)
  ops/      losses, streaming metrics, distance metrics, wavelets, SDF
  engine/   train-state combinators, epoch harness, checkpointing
  parallel/ mesh construction and sharding helpers
"""

__version__ = "0.1.0"
