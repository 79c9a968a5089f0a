"""LoRA fine-tuning CLI (capability extension — the reference is
inference-only; its README.md and src/bin expose no training at all).

    python -m sdxl_tpu.cli.train \
        --model-dir /ckpt/sdxl --dataset /data/my_style \
        --output my_style_lora.safetensors \
        --rank 16 --steps 1000 --batch 2 --lr 1e-4

Trains low-rank adapter factors over the frozen tower loaded by the
SAME checkpoint loaders inference uses (any of the 5 supported layouts)
and writes a kohya/peft .safetensors that this framework's `--lora`
flag — and the wider ecosystem — loads back. QLoRA: `--quantize int8`
keeps the frozen base weight-quantized in HBM while the f32 factors
train on top (exact-composition tested in tests/test_train_lora.py).
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp

from ..utils import log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdxl_tpu.cli.train",
        description="LoRA fine-tune over a frozen base checkpoint",
    )
    p.add_argument("--model-dir", type=str, required=True,
                   help="Base checkpoint (any supported layout)")
    p.add_argument("--family", type=str, default="sdxl",
                   choices=("sdxl", "sd1", "sd2", "sd3", "flux"),
                   help="Model family of the base checkpoint")
    p.add_argument("--dataset", type=str, required=True,
                   help="Folder of images; caption = same-stem .txt/"
                        ".caption (kohya layout), else the file stem")
    p.add_argument("--output", type=str, required=True,
                   help="Path for the trained .safetensors adapter")
    p.add_argument("--format", type=str, default=None,
                   choices=("kohya", "peft"),
                   help="Adapter key format (both load back via --lora; "
                        "default kohya for the UNet families, peft — "
                        "the diffusers convention — for sd3/flux)")
    p.add_argument("--resolution", type=int, default=1024,
                   help="Training resolution (shortest-side resize + "
                        "center crop); SD1/2 typically 512")
    # adapter geometry
    p.add_argument("--rank", "-r", type=int, default=16)
    p.add_argument("--targets", type=str, default="attn",
                   choices=("attn", "all-linear"),
                   help="attn = q/k/v/out of every attention (standard); "
                        "all-linear adds the GEGLU MLPs + proj_in/out")
    # full-parameter fine-tune (train/full.py)
    p.add_argument("--full", action="store_true",
                   help="Full-parameter fine-tune instead of LoRA "
                        "(UNet families): every float leaf of the tower "
                        "trains; --output becomes a directory receiving "
                        "a diffusers-layout unet/ (drop it into the base "
                        "checkpoint dir, dreambooth-style)")
    p.add_argument("--optimizer", type=str, default=None,
                   choices=("adamw", "adafactor"),
                   help="Full-FT optimizer (default adafactor: factored "
                        "second moment, O(rows+cols) state — fits the "
                        "full SDXL UNet on one chip; adamw needs 2x "
                        "param-bytes of f32 state — use with dp "
                        "sharding). LoRA always uses adamw.")
    p.add_argument("--master-dtype", type=str, default="f32",
                   choices=("f32", "bf16"),
                   help="Full-FT master-weight dtype (bf16 halves HBM)")
    # optimization
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--accum", type=int, default=1,
                   help="Gradient-accumulation microbatches per step "
                        "(lax.scan; identical update math to batch*accum)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--ema-decay", type=float, default=None,
                   help="Track an EMA of the factors and export it "
                        "instead of the raw weights (e.g. 0.999)")
    # diffusion loss knobs
    p.add_argument("--snr-gamma", type=float, default=None,
                   help="Min-SNR-gamma loss weighting (arXiv:2303.09556; "
                        "5.0 is the paper default)")
    p.add_argument("--noise-offset", type=float, default=0.0,
                   help="Per-sample constant noise offset (brightness-"
                        "range trick; kohya --noise_offset, e.g. 0.05)")
    p.add_argument("--caption-dropout", type=float, default=0.0,
                   help="Probability of training a sample against the "
                        "empty-prompt conditioning (CFG compatibility)")
    p.add_argument("--v-prediction", action="store_true",
                   help="Force the v-prediction target (auto-enabled "
                        "when the checkpoint's scheduler declares it, "
                        "e.g. SD 2.1-768)")
    # flow-matching (sd3/flux) knobs
    p.add_argument("--flow-shift", type=float, default=None,
                   help="Static timestep shift for the flow-matching "
                        "loss (default: the pipeline's own — SD3's "
                        "scheduler shift; for Flux, exp(mu) at the "
                        "training resolution's packed token count)")
    p.add_argument("--flux-guidance", type=float, default=1.0,
                   help="Embedded guidance scale FLUX.1-dev trains at "
                        "(the public fine-tune recipe uses 1.0)")
    p.add_argument("--no-t5", action="store_true",
                   help="SD3: drop the T5 tower (zero-padded context)")
    # memory / precision
    p.add_argument("--quantize", type=str, default=None,
                   choices=("int8", "int4"),
                   help="QLoRA: keep the frozen base weight-quantized")
    p.add_argument("--f32", action="store_true",
                   help="f32 frozen tower (default bf16)")
    p.add_argument("--no-remat", action="store_true",
                   help="Disable activation rematerialization (faster "
                        "steps, much higher HBM)")
    # checkpoint / resume
    p.add_argument("--ckpt-dir", type=str, default=None,
                   help="orbax training-state dir (enables --save-every "
                        "and --resume)")
    p.add_argument("--save-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest step in --ckpt-dir")
    # misc
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--base-lora", action="append", default=[],
                   metavar="PATH[:SCALE]",
                   help="LoRA(s) merged into the base BEFORE training "
                        "(continue training on top of a merged style)")
    p.add_argument("--tokenizer-dir", type=str, default=None)
    p.add_argument("--encode-chunk", type=int, default=4,
                   help="Images per VAE-encode/conditioning call during "
                        "dataset pre-encoding")
    return p


def load_frozen_pipeline(args):
    """Load the base checkpoint with TRAINING param prep: unfused
    self-attention q/k/v (adapters export under ecosystem names),
    unstacked transformer lists, optional QLoRA quantization applied
    AFTER the unfuse."""
    from ..io.lora import parse_lora_specs
    from ..models.unet import unfold_unet_upsample, unfuse_unet_qkv

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    loras = parse_lora_specs(args.base_lora)
    if args.family in ("sd3", "flux"):
        # the transformer loaders keep unfused ecosystem names and
        # apply QLoRA quantization themselves (after LoRA merges)
        if args.family == "sd3":
            from ..pipeline.sd3 import load_sd3_pipeline

            return load_sd3_pipeline(
                args.model_dir, compute_dtype=dtype,
                tokenizer_dir=args.tokenizer_dir,
                load_t5=not args.no_t5, loras=loras,
                quantize=args.quantize)
        from ..pipeline.flux import load_flux_pipeline

        return load_flux_pipeline(
            args.model_dir, compute_dtype=dtype,
            tokenizer_dir=args.tokenizer_dir, loras=loras,
            quantize=args.quantize)
    if args.family == "sdxl":
        from ..pipeline.loader import load_pipeline

        pipe = load_pipeline(
            args.model_dir, compute_dtype=dtype,
            tokenizer_dir=args.tokenizer_dir,
            stack_transformers=False, loras=loras)
    else:
        from ..configs import SD2_DIFFUSER, SD15_DIFFUSER
        from ..pipeline.sd1 import load_sd1_pipeline

        pipe = load_sd1_pipeline(
            args.model_dir, compute_dtype=dtype,
            tokenizer_dir=args.tokenizer_dir,
            penultimate_hidden=(args.family == "sd2"),
            diffuser_cfg=(SD2_DIFFUSER if args.family == "sd2"
                          else SD15_DIFFUSER),
            loras=loras)
    pipe.unet_params = unfuse_unet_qkv(pipe.unet_params)
    if args.full:
        # full FT must train the canonical 3x3 upsample kernels, not the
        # over-parameterized w4 phase form (see unfold_unet_upsample)
        pipe.unet_params = unfold_unet_upsample(pipe.unet_params)
    if args.quantize:
        from ..io.quantize import (
            UNET_KEEP8,
            UNET_WITHIN,
            parse_quantize_spec,
            quantize_tree,
        )

        pipe.unet_params = quantize_tree(
            pipe.unet_params, parse_quantize_spec(args.quantize),
            within=UNET_WITHIN, keep8=UNET_KEEP8)
    return pipe


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..train.finetune import (
        FinetuneConfig,
        encode_dataset,
        export_adapter,
        finetune_lora,
    )

    if args.resume and not args.ckpt_dir:
        log("--resume requires --ckpt-dir")
        return 2
    if args.full and args.family in ("sd3", "flux"):
        log("--full currently supports the UNet families (sdxl/sd1/sd2); "
            "use LoRA for sd3/flux")
        return 2
    if args.full and args.quantize:
        log("--full cannot train a quantized tower; drop --quantize "
            "(QLoRA is the quantized-base recipe)")
        return 2
    pipe = load_frozen_pipeline(args)
    is_fm = args.family in ("sd3", "flux")

    prediction_type = "epsilon"
    if not is_fm and (args.v_prediction or getattr(
            pipe.diffuser_cfg, "prediction_type", "eps") == "v"):
        prediction_type = "v"
        log("training with the v-prediction target")

    flow_shift = args.flow_shift
    if flow_shift is None and is_fm:
        if args.family == "sd3":
            flow_shift = float(pipe.flow_shift)
        else:
            import numpy as np

            # Flux dynamic shift at the training resolution's packed
            # token count: shift = exp(mu) (the exp-mu sigmoid map IS
            # the static rational shift with s = e^mu)
            seq = (args.resolution // 16) ** 2
            if pipe.dynamic_shifting:
                m = (pipe.max_shift - pipe.base_shift) / (4096 - 256)
                flow_shift = float(np.exp(seq * m
                                          + pipe.base_shift - m * 256))
            else:
                flow_shift = float(pipe.static_shift)
        log(f"flow-matching time shift: {flow_shift:.3f}")

    if is_fm:
        from ..train.finetune import encode_dataset_fm

        data = encode_dataset_fm(pipe, args.dataset, args.resolution,
                                 chunk=args.encode_chunk)
    else:
        data = encode_dataset(pipe, args.dataset, args.resolution,
                              chunk=args.encode_chunk)

    cfg = FinetuneConfig(
        rank=args.rank, targets=args.targets, steps=args.steps,
        full=args.full,
        optimizer=args.optimizer or ("adafactor" if args.full else "adamw"),
        master_dtype=args.master_dtype,
        batch_size=args.batch, accum=args.accum, lr=args.lr,
        warmup=args.warmup, weight_decay=args.weight_decay,
        grad_clip=args.grad_clip, snr_gamma=args.snr_gamma,
        noise_offset=args.noise_offset, prediction_type=prediction_type,
        flow_shift=flow_shift if flow_shift is not None else 1.0,
        flux_guidance=args.flux_guidance,
        caption_dropout=args.caption_dropout, ema_decay=args.ema_decay,
        seed=args.seed, remat=not args.no_remat,
        log_every=args.log_every, save_every=args.save_every,
        ckpt_dir=args.ckpt_dir, resume=args.resume,
    )
    if args.full:
        from ..io.diffusers_write import write_diffusers_unet_dir
        from ..train.finetune import finetune_full

        trained = finetune_full(pipe, data, cfg)
        unet_dir = write_diffusers_unet_dir(
            args.output, trained, pipe.diffuser_cfg.unet_config(),
            config_json_src=args.model_dir)
        log(f"wrote fine-tuned UNet (diffusers layout): {unet_dir} — "
            f"overlay it onto the base checkpoint directory to serve")
        return 0
    factors, ema = finetune_lora(pipe, data, cfg)
    fmt = args.format or ("peft" if is_fm else "kohya")
    export_adapter(
        args.output, ema if ema is not None else factors, pipe,
        fmt=fmt,
        metadata={
            "format": "pt",
            "sdxl_tpu_rank": str(args.rank),
            "sdxl_tpu_steps": str(args.steps),
            "sdxl_tpu_family": args.family,
        },
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
