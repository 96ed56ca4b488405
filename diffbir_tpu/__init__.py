"""diffbir_tpu — a TPU-native blind image restoration framework.

A ground-up JAX/XLA/Pallas rebuild of the two-stage blind-restoration
design pioneered by DiffBIR (reference: XPixelGroup/DiffBIR):

- Stage 1: a deterministic restoration network (SwinIR / RRDBNet / SCUNet)
  removes degradations and produces a clean-but-smooth condition image.
- Stage 2: a frozen Stable Diffusion 2.1 UNet + VAE + OpenCLIP text tower,
  steered by a trainable IRControlNet, regenerates realistic texture via a
  compiled denoising loop (``lax.scan``).

Design principles (TPU-first, not a port):
- NHWC layouts everywhere; bf16 params/compute with fp32 GroupNorm/softmax.
- All samplers compile to a single ``lax.scan`` over host-precomputed
  per-step coefficient tables; CFG is folded into the batch axis.
- Tiling (the resolution-scaling subsystem) is a pure wrapper transform over
  apply functions; tiles batch over a vmapped/sharded axis.
- Distribution is a ``jax.sharding.Mesh`` + NamedSharding; collectives are
  inserted by XLA, never hand-rolled.
"""

__version__ = "0.1.0"
