"""`merge` CLI: checkpoint merging (capability extension).

The ecosystem-standard model-merge recipes (the A1111/kohya
merge-models semantics, public math):

  weighted sum     out = (1 - alpha) * A + alpha * B
  add difference   out = A + alpha * (B - C)

applied leaf-wise over the UNet and both text towers (the tensors that
define a model's "style"); the VAE is taken from A unless --merge-vae.
Because every input goes through load_pipeline's format detection, the
inputs may be in DIFFERENT formats (a burn .mpk dir can merge with a
diffusers dir) — everything is normalized to the runtime tree first.
Output is a native checkpoint dir that load_pipeline/sample/serve read
back directly.

Merging runs on CPU (host RAM) by default: it is pure elementwise math,
and two f32 SDXL checkpoints must not contend for one chip's HBM.
"""

from __future__ import annotations

import argparse
import os
import sys


def _merge_trees(a, b, c, alpha: float, what: str):
    """Leaf-wise merge in f32; result leaves keep A's dtypes."""
    import jax
    import jax.numpy as jnp

    sa = jax.tree.structure(a)
    for other, name in ((b, "B"), (c, "C")):
        if other is not None and jax.tree.structure(other) != sa:
            raise ValueError(
                f"{what}: model {name}'s tree structure differs from A's "
                f"— same architecture/config required for merging")

    def lerp(la, lb):
        out = (1.0 - alpha) * la.astype(jnp.float32) \
            + alpha * lb.astype(jnp.float32)
        return out.astype(la.dtype)

    def add_diff(la, lb, lc):
        out = la.astype(jnp.float32) \
            + alpha * (lb.astype(jnp.float32) - lc.astype(jnp.float32))
        return out.astype(la.dtype)

    if c is None:
        return jax.tree.map(lerp, a, b)
    return jax.tree.map(add_diff, a, b, c)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Merge SDXL checkpoints (weighted sum / add "
                    "difference)")
    p.add_argument("--model-a", required=True,
                   help="primary checkpoint (any supported layout)")
    p.add_argument("--model-b", required=True,
                   help="secondary checkpoint")
    p.add_argument("--model-c", default=None,
                   help="with --model-c: add-difference mode, "
                        "out = A + alpha*(B - C)")
    p.add_argument("--alpha", "-m", type=float, default=0.5,
                   help="B's weight (weighted sum) / difference "
                        "multiplier (add difference); default 0.5")
    p.add_argument("--output-dir", required=True,
                   help="native checkpoint dir to write")
    p.add_argument("--merge-vae", action="store_true",
                   help="merge the VAEs too (default: A's VAE)")
    p.add_argument("--bf16", action="store_true",
                   help="save bf16 towers (halves the artifact; the "
                        "merge math itself always runs f32)")
    p.add_argument("--tokenizer-dir", type=str, default=None)
    p.add_argument("--device", action="store_true",
                   help="run on the accelerator instead of CPU")
    args = p.parse_args(argv)

    if not args.device:
        # before any jax import: leaf-wise math needs host RAM, not HBM
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax.numpy as jnp

    from ..io.checkpoint import save_native_pipeline
    from ..pipeline.loader import load_pipeline
    from ..utils import log

    def load(path):
        return load_pipeline(path, compute_dtype=jnp.float32,
                             tokenizer_dir=args.tokenizer_dir,
                             stack_transformers=False)

    pipe_a = load(args.model_a)
    pipe_b = load(args.model_b)
    if pipe_a.diffuser_cfg != pipe_b.diffuser_cfg \
            or pipe_a.embedder_cfg != pipe_b.embedder_cfg:
        log("models A and B have different configs — cannot merge")
        return 2
    pipe_c = load(args.model_c) if args.model_c else None
    mode = ("add difference" if pipe_c is not None else "weighted sum")
    log(f"merging ({mode}, alpha={args.alpha}): unet + text towers"
        + (" + vae" if args.merge_vae else ""))

    cp = pipe_c.unet_params if pipe_c else None
    pipe_a.unet_params = _merge_trees(
        pipe_a.unet_params, pipe_b.unet_params, cp, args.alpha, "unet")
    ce = pipe_c.embedder_params if pipe_c else None
    pipe_a.embedder_params = _merge_trees(
        pipe_a.embedder_params, pipe_b.embedder_params, ce, args.alpha,
        "embedder")
    if args.merge_vae:
        cv = pipe_c.vae_params if pipe_c else None
        pipe_a.vae_params = _merge_trees(
            pipe_a.vae_params, pipe_b.vae_params, cv, args.alpha, "vae")

    out = save_native_pipeline(
        args.output_dir, pipe_a,
        dtype=jnp.bfloat16 if args.bf16 else None)
    log(f"wrote merged checkpoint (native layout): {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
