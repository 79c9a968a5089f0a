"""`convert` CLI: checkpoint format conversion (native <-> burn mpk).

Counterpart of the reference's convert binary (convert/main.rs:72-121),
which turns the python/dump.py .npy tree into .mpk files. Inputs: the
reference .npy dump tree, a reference .mpk model dir, or this framework's
native dir. Outputs (--to): native safetensors+cfg (default) or the
reference's own .mpk model dir layout — so weights imported from
HF/diffusers can be exported back for the reference's `sample` binary.

Usage:
  python -m sdxl_tpu.cli.convert --dump-dir ./dump --output-dir ./weights
  python -m sdxl_tpu.cli.convert --mpk-dir  ./burn_weights --output-dir ./weights
  python -m sdxl_tpu.cli.convert --native-dir ./weights --to mpk --output-dir ./burn
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Convert SDXL weights between formats")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dump-dir", type=str, help="reference .npy dump tree")
    src.add_argument("--mpk-dir", type=str, help="reference .mpk model dir")
    src.add_argument("--native-dir", type=str, help="native safetensors model dir")
    src.add_argument(
        "--single-file", type=str, metavar="FILE",
        help="single-file checkpoint (sgm/ldm layout): .safetensors or the "
             "legacy torch-pickle .ckpt — with --family sd1|sd2 this is the "
             "classic v1-5-pruned.ckpt -> diffusers conversion flow")
    src.add_argument(
        "--inspect", type=str, metavar="FILE.mpk",
        help="dump a .mpk record tree (keys, shapes, dtype tags, wrapper "
             "variants) without building params — field diagnosis for "
             "first contact with a real burn artifact",
    )
    p.add_argument("--output-dir", type=str)
    p.add_argument("--to", choices=["native", "mpk", "diffusers"],
                   default="native")
    p.add_argument("--family", choices=["sdxl", "sd1", "sd2"],
                   default="sdxl",
                   help="Model family of --single-file (sd1/sd2 export to "
                        "the diffusers StableDiffusionPipeline layout only)")
    p.add_argument("--skip-refiner", action="store_true")
    args = p.parse_args(argv)

    if args.inspect:
        from ..io.burn_mpk import inspect_mpk

        print(inspect_mpk(args.inspect))
        return 0
    if not args.output_dir:
        p.error("--output-dir is required (except with --inspect)")

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

    if args.single_file and args.family in ("sd1", "sd2"):
        # classic A1111-era flow: v1-5-pruned.ckpt -> diffusers dir
        if args.to != "diffusers":
            print("error: --family sd1|sd2 exports to the diffusers "
                  "StableDiffusionPipeline layout only (--to diffusers)",
                  file=sys.stderr)
            return 1
        from ..configs import (
            CLIP_VIT_L_CONFIG,
            OPEN_CLIP_VITH_CONFIG,
            SD2_DIFFUSER,
            SD15_DIFFUSER,
            SD15_VAE_SCALE,
        )
        from ..io.diffusers_write import write_sd1_diffusers_pipeline_dir
        from ..io.hf_sdxl import load_sd1_single_file
        from ..tokenizer import ClipTokenizer

        sd2 = args.family == "sd2"
        clip_cfg = OPEN_CLIP_VITH_CONFIG if sd2 else CLIP_VIT_L_CONFIG
        d_cfg = SD2_DIFFUSER if sd2 else SD15_DIFFUSER
        log(f"loading {args.family} single-file checkpoint...")
        clip, unet, vae, d_cfg = load_sd1_single_file(
            args.single_file, d_cfg, clip_cfg, jnp.float16)
        log("writing diffusers pipeline dir...")
        write_sd1_diffusers_pipeline_dir(
            out, d_cfg, unet, clip_cfg, clip, vae,
            ClipTokenizer(), scale_factor=SD15_VAE_SCALE, sd2=sd2)
        log(f"done -> {out}")
        return 0

    if args.single_file:
        from ..io.hf_sdxl import load_sdxl_safetensors
        from ..pipeline.sampler import scaled_linear_alphas_cumprod

        e_cfg = SDXL_EMBEDDER
        d_cfg = SDXL_BASE_DIFFUSER
        log("loading SDXL single-file checkpoint...")
        e_params, unet, vae = load_sdxl_safetensors(
            args.single_file, d_cfg, e_cfg, jnp.float16)
        if e_params is None:
            print(f"error: conditioner weights missing in "
                  f"{args.single_file} (refiner-only checkpoint?)",
                  file=sys.stderr)
            return 1
        alphas = np.asarray(scaled_linear_alphas_cumprod(d_cfg.n_steps))
        r_cfg, r_unet = None, None
        l_cfg = LatentDecoderConfig()
    elif args.native_dir:
        from ..configs import DiffuserConfig, EmbedderConfig, load_cfg
        from ..pipeline.sampler import scaled_linear_alphas_cumprod

        nd = args.native_dir
        log("loading embedder (native)...")
        e_cfg = load_cfg(os.path.join(nd, "embedder.cfg"), EmbedderConfig)
        e_params = ckpt.load_native(os.path.join(nd, "embedder.safetensors"))
        log("loading base diffuser (native)...")
        d_cfg = load_cfg(os.path.join(nd, "diffuser.cfg"), DiffuserConfig)
        unet = ckpt.load_native(os.path.join(nd, "diffuser.safetensors"))
        a_path = os.path.join(nd, "alphas_cumprod.safetensors")
        alphas = (
            ckpt.load_native(a_path)["alphas_cumprod"]
            if os.path.isfile(a_path)
            else np.asarray(scaled_linear_alphas_cumprod(d_cfg.n_steps))
        )
        r_cfg, r_unet = None, None
        if not args.skip_refiner and os.path.isfile(
            os.path.join(nd, "refiner.safetensors")
        ):
            log("loading refiner (native)...")
            r_cfg = load_cfg(os.path.join(nd, "refiner.cfg"), DiffuserConfig)
            r_unet = ckpt.load_native(os.path.join(nd, "refiner.safetensors"))
        log("loading latent decoder (native)...")
        l_cfg = load_cfg(
            os.path.join(nd, "latent_decoder.cfg"), LatentDecoderConfig
        )
        vae = ckpt.load_native(os.path.join(nd, "latent_decoder.safetensors"))
    elif args.dump_dir:
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

    if args.to == "diffusers":
        # full diffusers-layout pipeline export (unet/ vae/ text_encoder*/
        # tokenizer*/ scheduler/ model_index.json) — the ecosystem interop
        # inverse of the diffusers-dir loader. The refiner has no place in
        # a StableDiffusionXLPipeline dir (diffusers ships it as its own
        # repo); exported separately would be its own pipeline class.
        from types import SimpleNamespace

        from ..io.diffusers_write import write_diffusers_pipeline_dir
        from ..tokenizer import ClipTokenizer, OpenClipTokenizer

        if r_unet is not None:
            log("note: the refiner is NOT part of a diffusers "
                "StableDiffusionXLPipeline dir and is skipped "
                "(diffusers ships it as a separate repo)")
        a_cfg_path = (os.path.join(args.native_dir, "autoencoder.cfg")
                      if args.native_dir else None)
        if a_cfg_path and os.path.isfile(a_cfg_path):
            from ..configs import AutoencoderConfig, load_cfg as _lc

            v_cfg = _lc(a_cfg_path, AutoencoderConfig)
        else:
            from ..configs import AutoencoderConfig

            v_cfg = AutoencoderConfig()
        log("writing diffusers pipeline dir...")
        write_diffusers_pipeline_dir(
            out,
            SimpleNamespace(
                diffuser_cfg=d_cfg, unet_params=unet,
                embedder_cfg=e_cfg, embedder_params=e_params,
                vae_cfg=v_cfg, vae_params=vae,
                scale_factor=l_cfg.scale_factor,
                alphas_cumprod=np.asarray(alphas),
                clip_tokenizer=ClipTokenizer(),
                open_clip_tokenizer=OpenClipTokenizer(),
            ),
        )
        log(f"done -> {out}")
        return 0

    if args.to == "mpk":
        from ..io import burn_mpk_write as w

        log("writing burn .mpk model dir...")
        w.write_embedder_mpk(os.path.join(out, "embedder.mpk"), e_params)
        save_cfg(os.path.join(out, "embedder.cfg"), e_cfg)
        w.write_diffuser_mpk(
            os.path.join(out, "diffuser.mpk"),
            d_cfg.unet_config(), unet, np.asarray(alphas),
        )
        save_cfg(os.path.join(out, "diffuser.cfg"), d_cfg)
        if r_unet is not None:
            w.write_diffuser_mpk(
                os.path.join(out, "refiner.mpk"),
                r_cfg.unet_config(), r_unet, np.asarray(alphas),
            )
            save_cfg(os.path.join(out, "refiner.cfg"), r_cfg)
        w.write_latent_decoder_mpk(
            os.path.join(out, "latent_decoder.mpk"), vae
        )
        save_cfg(os.path.join(out, "latent_decoder.cfg"), l_cfg)
        log(f"done -> {out}")
        return 0

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
