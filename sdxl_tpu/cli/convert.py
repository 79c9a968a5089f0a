"""`convert` CLI: reference checkpoint -> native safetensors.

Counterpart of the reference's convert binary (convert/main.rs:72-121),
which turns the python/dump.py .npy tree into .mpk files. Here either
reference layout (npy dump tree or .mpk model dir) is converted into this
framework's native format: one safetensors file per stage + .cfg JSON.

Usage:
  python -m sdxl_tpu.cli.convert --dump-dir ./dump --output-dir ./weights
  python -m sdxl_tpu.cli.convert --mpk-dir  ./burn_weights --output-dir ./weights
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Convert SDXL weights to native format")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dump-dir", type=str, help="reference .npy dump tree")
    src.add_argument("--mpk-dir", type=str, help="reference .mpk model dir")
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--skip-refiner", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..configs import (
        SDXL_BASE_DIFFUSER,
        SDXL_EMBEDDER,
        SDXL_REFINER_DIFFUSER,
        LatentDecoderConfig,
        save_cfg,
    )
    from ..io import checkpoint as ckpt
    from ..utils import log

    os.makedirs(args.output_dir, exist_ok=True)
    out = args.output_dir

    if args.dump_dir:
        e_cfg = SDXL_EMBEDDER
        log("loading embedder (npy)...")
        e_params = ckpt.load_embedder_npy(args.dump_dir, e_cfg)
        d_cfg = SDXL_BASE_DIFFUSER
        log("loading base diffuser (npy)...")
        unet, alphas = ckpt.load_diffuser_npy(args.dump_dir, d_cfg, False, jnp.float16)
        r_cfg, r_unet = None, None
        if not args.skip_refiner:
            r_cfg = SDXL_REFINER_DIFFUSER
            log("loading refiner (npy)...")
            r_unet, _ = ckpt.load_diffuser_npy(args.dump_dir, r_cfg, True, jnp.float16)
        log("loading latent decoder (npy)...")
        vae, scale = ckpt.load_latent_decoder_npy(args.dump_dir)
        l_cfg = LatentDecoderConfig(scale_factor=scale)
    else:
        log("loading embedder (mpk)...")
        e_cfg, e_params = ckpt.load_embedder_mpk(args.mpk_dir)
        log("loading base diffuser (mpk)...")
        d_cfg, unet, alphas = ckpt.load_diffuser_mpk(args.mpk_dir, "diffuser", jnp.float16)
        r_cfg, r_unet = None, None
        if not args.skip_refiner and os.path.isfile(
            os.path.join(args.mpk_dir, "refiner.mpk")
        ):
            log("loading refiner (mpk)...")
            r_cfg, r_unet, _ = ckpt.load_diffuser_mpk(args.mpk_dir, "refiner", jnp.float16)
        log("loading latent decoder (mpk)...")
        l_cfg, vae = ckpt.load_latent_decoder_mpk(args.mpk_dir)

    log("writing native checkpoint...")
    ckpt.save_native(os.path.join(out, "embedder.safetensors"), e_params)
    save_cfg(os.path.join(out, "embedder.cfg"), e_cfg)
    ckpt.save_native(os.path.join(out, "diffuser.safetensors"), unet)
    save_cfg(os.path.join(out, "diffuser.cfg"), d_cfg)
    ckpt.save_native(
        os.path.join(out, "alphas_cumprod.safetensors"),
        {"alphas_cumprod": np.asarray(alphas)},
    )
    if r_unet is not None:
        ckpt.save_native(os.path.join(out, "refiner.safetensors"), r_unet)
        save_cfg(os.path.join(out, "refiner.cfg"), r_cfg)
    ckpt.save_native(os.path.join(out, "latent_decoder.safetensors"), vae)
    save_cfg(os.path.join(out, "latent_decoder.cfg"), l_cfg)
    log(f"done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
