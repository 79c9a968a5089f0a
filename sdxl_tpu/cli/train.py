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
    p.add_argument("--train-text-encoder", action="store_true",
                   help="SDXL-family LoRA: also train both CLIP towers "
                        "(kohya's recipe) — the towers run in-graph from "
                        "token ids with their own factor leaves; exports "
                        "lora_te1_/lora_te2_ (kohya) or text_encoder./"
                        "text_encoder_2. (peft) keys that --lora merges "
                        "back")
    p.add_argument("--te-lr", type=float, default=None,
                   help="Separate text-encoder learning rate (default: "
                        "--lr; kohya commonly uses ~half the UNet lr)")
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
    p.add_argument("--multires-noise", type=int, default=0,
                   metavar="N",
                   help="Multi-resolution (pyramid) noise with N levels "
                        "(kohya --multires_noise_iterations, e.g. 6; "
                        "UNet families)")
    p.add_argument("--multires-discount", type=float, default=0.3,
                   help="Per-level amplitude discount for "
                        "--multires-noise")
    # textual inversion (arXiv:2208.01618) — trains embedding rows
    # instead of LoRA factors; exports the --embedding file format
    p.add_argument("--textual-inversion", type=str, default=None,
                   metavar="WORD",
                   help="Train a textual-inversion concept for WORD "
                        "(UNet families) instead of a LoRA; --output "
                        "becomes the embedding .safetensors the "
                        "inference --embedding flag loads")
    p.add_argument("--ti-vectors", type=int, default=1,
                   help="Embedding vectors per tower for the concept")
    p.add_argument("--ti-init-word", type=str, default=None,
                   help="Initialize the rows from this word's embedding "
                        "(diffusers initializer_token)")
    p.add_argument("--ti-templates", type=str, default="object",
                   choices=("object", "style", "captions"),
                   help="Prompt source: the paper's object/style "
                        "template banks, or the folder's own captions "
                        "(each must contain the placeholder)")
    # DreamBooth prior preservation (arXiv:2208.12242)
    # ControlNet training (arXiv:2302.05543) — trains a control trunk
    # against the frozen base UNet; exports a diffusers ControlNetModel
    # dir the inference --controlnet flag loads back
    p.add_argument("--train-controlnet", action="store_true",
                   help="Train a ControlNet (UNet-copy init, zero convs "
                        "zero). --output becomes a DIRECTORY (diffusers "
                        "ControlNetModel layout). Requires "
                        "--control-dataset.")
    p.add_argument("--control-dataset", type=str, default=None,
                   help="Folder of conditioning images (canny/depth/...) "
                        "with the SAME file stems as --dataset")
    p.add_argument("--controlnet-init", type=str, default=None,
                   help="Continue from an existing diffusers ControlNet "
                        "dir instead of the UNet-copy init")
    p.add_argument("--prior-dataset", type=str, default=None,
                   help="Class-image folder for DreamBooth prior "
                        "preservation; every microbatch trains "
                        "instance rows + class rows with the composed "
                        "loss mean(instance) + w*mean(class)")
    p.add_argument("--prior-weight", type=float, default=1.0,
                   help="w in the prior-preservation loss (paper/"
                        "diffusers default 1.0)")
    p.add_argument("--prior-batch", type=int, default=0,
                   help="Class rows per microbatch (default: --batch)")
    p.add_argument("--class-prompt", type=str, default=None,
                   help="With --num-class-images: prompt the BASE model "
                        "generates the class set from (also the caption "
                        "written next to each generated image)")
    p.add_argument("--num-class-images", type=int, default=0,
                   help="Top --prior-dataset up to N images by sampling "
                        "the frozen base model from --class-prompt "
                        "before training (the DreamBooth recipe)")
    p.add_argument("--bucketing", action="store_true",
                   help="Aspect-ratio bucket training (kohya recipe): "
                        "images group into the SDXL aspect buckets "
                        "scaled to --resolution; each bucket is one "
                        "static shape / compiled step (UNet families)")
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
    # in-training validation sampling (train/validate.py): renders
    # --sample-prompt through the real pipeline with the live adapter
    p.add_argument("--sample-every", type=int, default=0,
                   help="Render a validation image every N steps "
                        "(0 = off; needs --sample-prompt)")
    p.add_argument("--sample-prompt", type=str, default="")
    p.add_argument("--sample-steps", type=int, default=20)
    p.add_argument("--sample-resolution", type=int, default=0,
                   help="validation image size (default 512)")
    p.add_argument("--sample-guidance", type=float, default=7.5)
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
    if args.num_class_images and not (args.prior_dataset
                                      and args.class_prompt):
        log("--num-class-images requires --prior-dataset and "
            "--class-prompt")
        return 2
    if args.full and args.family in ("sd3", "flux"):
        log("--full currently supports the UNet families (sdxl/sd1/sd2); "
            "use LoRA for sd3/flux")
        return 2
    if args.full and args.quantize:
        log("--full cannot train a quantized tower; drop --quantize "
            "(QLoRA is the quantized-base recipe)")
        return 2
    if args.train_text_encoder:
        if args.family != "sdxl":
            log("--train-text-encoder is the SDXL dual-tower LoRA recipe "
                "(--family sdxl)")
            return 2
        if args.full or args.textual_inversion or args.train_controlnet:
            log("--train-text-encoder is a LoRA mode; not combinable with "
                "--full / --textual-inversion / --train-controlnet")
            return 2
    if args.textual_inversion and args.family in ("sd3", "flux"):
        log("--textual-inversion supports the CLIP-conditioned UNet "
            "families (sdxl/sd1/sd2)")
        return 2
    if args.textual_inversion and (args.full or args.quantize):
        log("--textual-inversion is not combinable with --full/--quantize")
        return 2
    if args.train_controlnet:
        if args.family in ("sd3", "flux"):
            log("--train-controlnet supports the UNet families "
                "(sdxl/sd1/sd2)")
            return 2
        if not args.control_dataset:
            log("--train-controlnet requires --control-dataset")
            return 2
        if args.full or args.quantize or args.textual_inversion \
                or args.prior_dataset:
            log("--train-controlnet is not combinable with --full/"
                "--quantize/--textual-inversion/--prior-dataset")
            return 2
    pipe = load_frozen_pipeline(args)
    is_fm = args.family in ("sd3", "flux")

    if args.textual_inversion:
        from ..train.textual_inversion import (
            TIConfig,
            encode_ti_dataset,
            export_ti,
            train_textual_inversion,
        )

        pred = "v" if (args.v_prediction or getattr(
            pipe.diffuser_cfg, "prediction_type", "eps") == "v") else "epsilon"
        ti_cfg = TIConfig(
            placeholder=args.textual_inversion, n_vectors=args.ti_vectors,
            init_word=args.ti_init_word, templates=args.ti_templates,
            steps=args.steps, batch_size=args.batch, lr=args.lr,
            warmup=args.warmup, grad_clip=args.grad_clip,
            prediction_type=pred, noise_offset=args.noise_offset,
            seed=args.seed, remat=not args.no_remat,
            log_every=args.log_every or 25)
        data = encode_ti_dataset(pipe, args.dataset, args.resolution,
                                 ti_cfg, chunk=args.encode_chunk)
        rows = train_textual_inversion(pipe, data, ti_cfg)
        export_ti(args.output, rows, metadata={
            "format": "pt",
            "sdxl_tpu_placeholder": args.textual_inversion,
            "sdxl_tpu_steps": str(args.steps),
        })
        return 0

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

    if args.prior_dataset and args.num_class_images:
        from ..train.finetune import ensure_class_images

        ensure_class_images(
            pipe, args.prior_dataset, args.class_prompt,
            args.num_class_images, args.resolution, seed=args.seed)

    if args.bucketing and (is_fm or args.prior_dataset):
        log("--bucketing supports the UNet families without "
            "--prior-dataset (the prior batch must share the "
            "instance batch's shape)")
        return 2
    if is_fm:
        from ..train.finetune import encode_dataset_fm as _encode
    elif args.bucketing:
        from ..train.finetune import encode_dataset_bucketed as _encode
    else:
        _encode = encode_dataset
    data = _encode(pipe, args.dataset, args.resolution,
                   chunk=args.encode_chunk,
                   **({"control_dir": args.control_dataset}
                      if args.train_controlnet else {}))
    prior_data = None
    if args.prior_dataset:
        prior_data = _encode(pipe, args.prior_dataset, args.resolution,
                             chunk=args.encode_chunk)

    cfg = FinetuneConfig(
        rank=args.rank, targets=args.targets, steps=args.steps,
        train_text_encoder=args.train_text_encoder, te_lr=args.te_lr,
        full=args.full,
        optimizer=args.optimizer or ("adafactor" if args.full else "adamw"),
        master_dtype=args.master_dtype,
        batch_size=args.batch, accum=args.accum, lr=args.lr,
        warmup=args.warmup, weight_decay=args.weight_decay,
        grad_clip=args.grad_clip, snr_gamma=args.snr_gamma,
        noise_offset=args.noise_offset,
        multires_iterations=args.multires_noise,
        multires_discount=args.multires_discount,
        prediction_type=prediction_type,
        flow_shift=flow_shift if flow_shift is not None else 1.0,
        flux_guidance=args.flux_guidance,
        prior_weight=args.prior_weight, prior_batch_size=args.prior_batch,
        caption_dropout=args.caption_dropout, ema_decay=args.ema_decay,
        seed=args.seed, remat=not args.no_remat,
        log_every=args.log_every, save_every=args.save_every,
        ckpt_dir=args.ckpt_dir, resume=args.resume,
        sample_every=args.sample_every, sample_prompt=args.sample_prompt,
        sample_steps=args.sample_steps,
        sample_resolution=args.sample_resolution or args.resolution,
        sample_guidance=args.sample_guidance, sample_seed=args.seed,
        sample_dir=args.output.rstrip("/") + "_val",
    )
    if args.train_controlnet:
        from ..train.controlnet import (
            export_controlnet,
            finetune_controlnet,
        )

        control = None
        if args.controlnet_init:
            from ..io.diffusers_sdxl import load_controlnet_dir

            control, _ = load_controlnet_dir(
                args.controlnet_init, pipe.diffuser_cfg, jnp.float32)
            log(f"controlnet: continuing from {args.controlnet_init}")
        trained = finetune_controlnet(pipe, data, cfg, control=control)
        export_controlnet(args.output, trained, pipe,
                          config_json_src=args.controlnet_init)
        log("serve it with: --controlnet " + args.output)
        return 0
    if args.full:
        from ..io.diffusers_write import write_diffusers_unet_dir
        from ..train.finetune import finetune_full

        trained = finetune_full(pipe, data, cfg, prior_data=prior_data)
        unet_dir = write_diffusers_unet_dir(
            args.output, trained, pipe.diffuser_cfg.unet_config(),
            config_json_src=args.model_dir)
        log(f"wrote fine-tuned UNet (diffusers layout): {unet_dir} — "
            f"overlay it onto the base checkpoint directory to serve")
        return 0
    factors, ema = finetune_lora(pipe, data, cfg, prior_data=prior_data)
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
