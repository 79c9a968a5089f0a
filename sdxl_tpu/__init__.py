"""sdxl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Stable Diffusion XL inference framework.

Capability-parity rebuild of the reference Rust/Burn implementation
(Gadersd/stable-diffusion-xl-burn), redesigned TPU-first:

- pytrees of arrays + pure functions instead of module-tree OOP
- one jitted program per pipeline stage; the whole DDIM sampler compiles
  into a single ``lax.scan`` (no per-step host syncs)
- NHWC conv layout, bf16 UNet on the MXU, Pallas flash-attention for the
  spatial self-attention hot spots
- batch/tensor parallel sampling via ``jax.sharding.Mesh`` + pjit

Reference parity map lives in SURVEY.md; every module cites the reference
file:line it reimplements.
"""

__version__ = "0.1.0"

__all__ = [
    "configs",
    "models",
    "ops",
    "pipeline",
    "parallel",
    "tokenizer",
    "io",
    "utils",
]
