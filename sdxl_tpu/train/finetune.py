"""LoRA fine-tuning driver: image-folder dataset -> cached latents +
conditioning -> jitted train loop -> ecosystem .safetensors adapter.

Capability extension (the reference is inference-only, SURVEY.md §2).
TPU-first shape discipline: every step runs ONE jitted program — the
dataset is pre-encoded once (VAE latents + text conditioning, both
through the same jitted inference towers the sampler uses), batches are
host-side numpy gathers with static shapes, and the model forward is
rematerialized (jax.checkpoint) so the backward pass recomputes
activations instead of holding the whole UNet's forward in HBM.

Dataset format: a folder of images; the caption for ``img.png`` is
``img.txt`` (or ``.caption``) next to it — the kohya folder convention.
Images are resized (shortest side) + center-cropped to the training
resolution. Caption dropout replaces the conditioning with the cached
empty-prompt conditioning (standard CFG-compatible fine-tune recipe).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log
from .lora import export_lora, init_lora, set_leaves
from .losses import diffusion_loss, flow_matching_loss
from .step import TrainState, adamw_cosine, make_train_step

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------


def list_image_folder(dataset_dir: str) -> list:
    """[(image_path, caption)] pairs; caption file = same stem + .txt or
    .caption (kohya folder layout), else the file stem with '_'/'-' as
    spaces."""
    items = []
    for name in sorted(os.listdir(dataset_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in IMAGE_EXTS:
            continue
        path = os.path.join(dataset_dir, name)
        caption = None
        for cext in (".txt", ".caption"):
            cpath = os.path.join(dataset_dir, stem + cext)
            if os.path.exists(cpath):
                with open(cpath, "r", encoding="utf-8") as f:
                    caption = f.read().strip()
                break
        if caption is None:
            caption = stem.replace("_", " ").replace("-", " ").strip()
        items.append((path, caption))
    if not items:
        raise FileNotFoundError(f"{dataset_dir}: no images found")
    return items


def _control_path(control_dir: str, image_path: str) -> str:
    """The conditioning image matching a training image: same stem in
    control_dir, any image extension (kohya controlnet folder layout)."""
    stem = os.path.splitext(os.path.basename(image_path))[0]
    for ext in IMAGE_EXTS:
        p = os.path.join(control_dir, stem + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"{control_dir}: no conditioning image for {stem!r} "
        f"(expected {stem}.png/.jpg/... matching the training image)")


def load_image_rgb(path: str, resolution) -> np.ndarray:
    """uint8 [H, W, 3]: cover-resize (bicubic) + center crop. resolution
    is one int (square) or an (h, w) pair (aspect-bucket training)."""
    from PIL import Image

    th, tw = ((resolution, resolution) if isinstance(resolution, int)
              else resolution)
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = max(tw / w, th / h)
    nw, nh = max(round(w * scale), tw), max(round(h * scale), th)
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - tw) // 2, (nh - th) // 2
    img = img.crop((left, top, left + tw, top + th))
    return np.asarray(img, np.uint8)


def train_buckets(resolution: int) -> list:
    """(h, w) aspect buckets at a training scale: the 40 SDXL-trained
    buckets (pipeline/resolutions.py) rescaled by resolution/1024 and
    snapped to the latent-grid multiple of 64 (the kohya bucketing
    granularity). resolution=1024 returns the SDXL table itself."""
    from ..pipeline.resolutions import RESOLUTIONS

    out, seen = [], set()
    for h, w in RESOLUTIONS:
        bh = max(64, round(h * resolution / 1024 / 64) * 64)
        bw = max(64, round(w * resolution / 1024 / 64) * 64)
        if (bh, bw) not in seen:
            seen.add((bh, bw))
            out.append((bh, bw))
    return out


def assign_bucket(width: int, height: int, buckets: list) -> int:
    """Index of the bucket whose aspect ratio is closest (in log space)
    to the source image's."""
    import math

    a = math.log(width / height)
    return min(range(len(buckets)),
               key=lambda i: abs(math.log(buckets[i][1] / buckets[i][0])
                                 - a))


@dataclass
class EncodedDataset:
    latents: np.ndarray            # [N, h, w, c] f32, already VAE-scaled
    ctx: np.ndarray                # [N, T, d] text context
    label: Optional[np.ndarray]    # [N, adm] channel context (UNet fams)
    uncond_ctx: np.ndarray         # [T, d] empty-prompt context
    uncond_label: Optional[np.ndarray]
    captions: list
    # ControlNet training: per-image conditioning images (canny/depth/...),
    # uint8 [N, res, res, 3] at PIXEL resolution — converted to f32 [0,1]
    # (the diffusers control-image convention) at batch-gather time
    control: Optional[np.ndarray] = None
    # text-encoder training (SDXL family): single-chunk token ids so the
    # towers can run IN-GRAPH with LoRA factors (the cached ctx/label
    # above were computed by the frozen towers and go stale the moment a
    # TE factor trains)
    tok_clip: Optional[np.ndarray] = None        # [N, 77] int32
    tok_oc: Optional[np.ndarray] = None          # [N, 77] int32
    uncond_tok_clip: Optional[np.ndarray] = None  # [77] ("" ids)
    uncond_tok_oc: Optional[np.ndarray] = None
    size_hw: Optional[tuple] = None              # (h, w) pixel dims

    @property
    def n(self) -> int:
        return self.latents.shape[0]


def _encode_items(
    pipe, items: list, size, chunk: int = 4,
    control_dir: Optional[str] = None,
) -> EncodedDataset:
    """Encode [(path, caption)] at one static (h, w): VAE latents + text
    conditioning through the pipeline's own frozen towers. The SDXL size
    conditioning carries the actual bucket dims, exactly what inference
    at that resolution conditions on."""
    from ..pipeline.latent import encode_images_to_latent

    hw = (size, size) if isinstance(size, int) else tuple(size)
    control = None
    if control_dir is not None:
        control = np.stack([
            load_image_rgb(_control_path(control_dir, p), hw)
            for p, _ in items])

    lat_chunks, ctx_chunks, label_chunks = [], [], []
    encode = jax.jit(lambda imgs: encode_images_to_latent(
        pipe.vae_params, pipe.vae_cfg, imgs, pipe.scale_factor))
    for i in range(0, len(items), chunk):
        part = items[i:i + chunk]
        imgs = jnp.asarray(
            np.stack([load_image_rgb(p, hw) for p, _ in part]))
        lat_chunks.append(np.asarray(encode(imgs), np.float32))
        cond = pipe.conditioning(
            [c for _, c in part], hw, profile_stages=False)
        ctx_chunks.append(np.asarray(cond.context_full, np.float32))
        if cond.channel_context is not None:
            label_chunks.append(np.asarray(cond.channel_context, np.float32))

    # empty-prompt conditioning for caption dropout (the uncond half the
    # CFG inference path will use, stablediffusion/mod.rs:698-726)
    uncond = pipe.conditioning([""], hw, profile_stages=False)

    # long captions chunk the context to [B, 77k, d]; pad every example
    # to the longest k so the batch gather is static-shaped
    t_max = max(c.shape[1] for c in ctx_chunks)

    def pad_t(c):
        if c.shape[1] == t_max:
            return c
        reps = -(-t_max // c.shape[1])
        return np.tile(c, (1, reps, 1))[:, :t_max]

    ctx = np.concatenate([pad_t(c) for c in ctx_chunks], 0)

    # single-chunk token ids for in-graph text-encoder training (SDXL
    # family: both tokenizers present). Cheap to store; unused unless
    # --train-text-encoder puts the towers in the step graph.
    tok_clip = tok_oc = u_tc = u_to = None
    if (getattr(pipe, "clip_tokenizer", None) is not None
            and getattr(pipe, "open_clip_tokenizer", None) is not None
            and hasattr(getattr(pipe, "embedder_cfg", None),
                        "clip_config")):
        from ..tokenizer.bpe import tokenize_text

        n_ctx = pipe.embedder_cfg.clip_config.n_ctx
        tok_clip = np.asarray(
            [tokenize_text(c, pipe.clip_tokenizer, n_ctx)
             for _, c in items], np.int32)
        tok_oc = np.asarray(
            [tokenize_text(c, pipe.open_clip_tokenizer, n_ctx)
             for _, c in items], np.int32)
        u_tc = np.asarray(tokenize_text("", pipe.clip_tokenizer, n_ctx),
                          np.int32)
        u_to = np.asarray(tokenize_text("", pipe.open_clip_tokenizer,
                                        n_ctx), np.int32)

    return EncodedDataset(
        latents=np.concatenate(lat_chunks, 0),
        ctx=ctx,
        label=np.concatenate(label_chunks, 0) if label_chunks else None,
        uncond_ctx=pad_t(np.asarray(uncond.context_full, np.float32))[0],
        uncond_label=(
            np.asarray(uncond.channel_context, np.float32)[0]
            if uncond.channel_context is not None else None),
        captions=[c for _, c in items],
        control=control,
        tok_clip=tok_clip, tok_oc=tok_oc,
        uncond_tok_clip=u_tc, uncond_tok_oc=u_to,
        size_hw=hw,
    )


def encode_dataset(
    pipe, dataset_dir: str, resolution: int, chunk: int = 4,
    control_dir: Optional[str] = None,
) -> EncodedDataset:
    """Pre-encode the whole folder through the pipeline's own (frozen)
    VAE encoder + text towers — the exact tensors the sampler would
    consume at inference, so a LoRA trained here sees the same
    conditioning distribution it will be served with.

    control_dir: optional parallel folder of conditioning images for
    ControlNet training — each training image must have a SAME-NAMED
    file there (any image extension); stored at pixel resolution, NOT
    VAE-encoded (the trainable cond_embed consumes pixels)."""
    items = list_image_folder(dataset_dir)
    log(f"dataset: {len(items)} images @ {resolution}px from {dataset_dir}")
    return _encode_items(pipe, items, resolution, chunk, control_dir)


@dataclass
class BucketedDataset:
    """Aspect-ratio-bucketed training set (the kohya recipe, TPU-first):
    every bucket is ONE static shape — each draws its own compiled step
    program from jit's cache, so the whole run stays shape-static with at
    most n_buckets compilations (vs. the GPU habit of padding or dynamic
    shapes, which XLA:TPU would recompile per shape anyway)."""
    buckets: list                  # EncodedDataset per non-empty bucket
    sizes: list                    # (h, w) pixel dims, aligned

    @property
    def n(self) -> int:
        return sum(b.n for b in self.buckets)

    @property
    def control(self):
        return self.buckets[0].control if self.buckets else None


def encode_dataset_bucketed(
    pipe, dataset_dir: str, resolution: int, chunk: int = 4,
    control_dir: Optional[str] = None,
) -> BucketedDataset:
    """encode_dataset with aspect-ratio bucketing: each image lands in
    the train_buckets() entry nearest its aspect (log space), is
    cover-resized + center-cropped to the bucket dims, and its SDXL size
    conditioning carries those dims (what the model should associate
    with the bucket at inference)."""
    from PIL import Image

    items = list_image_folder(dataset_dir)
    dims = train_buckets(resolution)
    groups: dict = {}
    for it in items:
        with Image.open(it[0]) as im:
            w, h = im.size
        groups.setdefault(assign_bucket(w, h, dims), []).append(it)

    buckets, sizes = [], []
    for bi in sorted(groups):
        hw = dims[bi]
        log(f"bucket {hw[0]}x{hw[1]}: {len(groups[bi])} images")
        buckets.append(_encode_items(pipe, groups[bi], hw, chunk,
                                     control_dir))
        sizes.append(hw)
    log(f"dataset: {len(items)} images in {len(buckets)} aspect buckets "
        f"@ ~{resolution}px from {dataset_dir}")
    return BucketedDataset(buckets=buckets, sizes=sizes)


def sample_batch(
    data: EncodedDataset, batch_size: int, rng: np.random.Generator,
    caption_dropout: float = 0.0,
) -> dict:
    idx = rng.integers(0, data.n, (batch_size,))
    ctx = data.ctx[idx]
    label = data.label[idx] if data.label is not None else None
    drop = (rng.random(batch_size) < caption_dropout
            if caption_dropout > 0.0 else None)
    if drop is not None:
        ctx = np.where(drop[:, None, None], data.uncond_ctx[None], ctx)
        if label is not None:
            label = np.where(drop[:, None], data.uncond_label[None], label)
    batch = {"latents": data.latents[idx], "ctx": ctx}
    if label is not None:
        batch["label"] = label
    if data.tok_clip is not None:
        # token ids for in-graph conditioning (--train-text-encoder);
        # caption dropout swaps in the "" ids, mirroring the cached-ctx
        # dropout above
        tc, to = data.tok_clip[idx], data.tok_oc[idx]
        if drop is not None:
            tc = np.where(drop[:, None], data.uncond_tok_clip[None], tc)
            to = np.where(drop[:, None], data.uncond_tok_oc[None], to)
        batch["tok_clip"], batch["tok_oc"] = tc, to
        h, w = data.size_hw
        size = np.broadcast_to(
            np.array([[h, w]], np.int32), (batch_size, 2)).copy()
        batch["size"] = size
        batch["crop"] = np.zeros((batch_size, 2), np.int32)
        batch["ar"] = size.copy()
    if data.control is not None:
        # caption dropout keeps the control image: at inference the CFG
        # uncond branch ALSO receives control residuals (diffusers'
        # train_controlnet drops only the text)
        batch["control"] = data.control[idx].astype(np.float32) / 255.0
    return batch


def sample_batch_prior(
    data: EncodedDataset,
    prior: EncodedDataset,
    batch_size: int,
    prior_batch: int,
    rng: np.random.Generator,
    caption_dropout: float = 0.0,
    prior_weight: float = 1.0,
) -> dict:
    """DreamBooth prior-preservation batch (arXiv:2208.12242): instance
    rows followed by class rows in ONE batch, with per-example loss
    weights 1/B_inst and prior_weight/B_class so the weighted-sum loss
    (train/losses._reduce) equals mean(instance) + w * mean(class) —
    diffusers' train_dreambooth.py chunked loss, in a single fused
    forward instead of two. Caption dropout applies to the instance half
    only (the class prompt IS the regularizer)."""
    inst = sample_batch(data, batch_size, rng, caption_dropout)
    cls = sample_batch(prior, prior_batch, rng, 0.0)
    if ("label" in inst) != ("label" in cls):
        raise ValueError("instance and class datasets were encoded for "
                         "different conditioning layouts")
    if inst["ctx"].shape[1] != cls["ctx"].shape[1]:
        # long-caption chunking can give the two folders different k;
        # tile the shorter context to the common token count
        t_max = max(inst["ctx"].shape[1], cls["ctx"].shape[1])

        def pad_t(c):
            if c.shape[1] == t_max:
                return c
            reps = -(-t_max // c.shape[1])
            return np.tile(c, (1, reps, 1))[:, :t_max]

        inst["ctx"], cls["ctx"] = pad_t(inst["ctx"]), pad_t(cls["ctx"])
    batch = {k: np.concatenate([inst[k], cls[k]], 0) for k in inst}
    batch["loss_weight"] = np.concatenate([
        np.full((batch_size,), 1.0 / batch_size, np.float32),
        np.full((prior_batch,), prior_weight / prior_batch, np.float32),
    ])
    return batch


def ensure_class_images(
    pipe,
    class_dir: str,
    class_prompt: str,
    num: int,
    resolution: int,
    n_steps: int = 30,
    guidance_scale: Optional[float] = None,
    batch: int = 1,
    seed: int = 0,
) -> int:
    """Top up ``class_dir`` to ``num`` class images generated by the BASE
    pipeline itself from ``class_prompt`` (the DreamBooth recipe: the
    prior-preservation set is the frozen model's own notion of the
    class). Each image gets a sibling .txt carrying the class prompt.
    Returns how many were generated."""
    from PIL import Image

    os.makedirs(class_dir, exist_ok=True)
    have = sum(
        1 for n in os.listdir(class_dir)
        if os.path.splitext(n)[1].lower() in IMAGE_EXTS)
    missing = num - have
    if missing <= 0:
        return 0
    log(f"prior set: generating {missing} class images for "
        f"{class_prompt!r} into {class_dir}")
    kwargs = {}
    if guidance_scale is not None:
        kwargs["guidance_scale"] = guidance_scale
    made = 0
    while made < missing:
        b = min(batch, missing - made)
        imgs = pipe.txt2img(
            [class_prompt] * b, resolution=(resolution, resolution),
            n_steps=n_steps, seed=seed + have + made, **kwargs)
        for j in range(b):
            stem = os.path.join(class_dir, f"class_{have + made + j:05d}")
            Image.fromarray(np.asarray(imgs[j])).save(stem + ".png")
            with open(stem + ".txt", "w", encoding="utf-8") as f:
                f.write(class_prompt)
        made += b
    return made


# ---------------------------------------------------------------------------
# the fine-tune loop
# ---------------------------------------------------------------------------


@dataclass
class FinetuneConfig:
    rank: int = 16
    targets: str = "attn"          # train/lora.py preset
    # SDXL-family LoRA: also train both CLIP towers (kohya's
    # --train-text-encoder). The towers run IN-GRAPH from token ids with
    # their own factor leaves; te_lr overrides the tower learning rate
    train_text_encoder: bool = False
    te_lr: Optional[float] = None
    full: bool = False             # full-parameter FT (train/full.py)
    optimizer: str = "adamw"       # "adamw" | "adafactor" (full FT)
    master_dtype: str = "f32"      # full FT master weights: "f32" | "bf16"
    steps: int = 1000
    # lr-schedule horizon; defaults to `steps`. Set when a run will stop
    # early and resume later, so both legs build the SAME cosine decay
    schedule_steps: Optional[int] = None
    batch_size: int = 1
    accum: int = 1
    lr: float = 1e-4
    warmup: int = 0
    weight_decay: float = 0.0
    grad_clip: Optional[float] = 1.0
    snr_gamma: Optional[float] = None      # UNet families
    noise_offset: float = 0.0              # UNet families
    multires_iterations: int = 0           # pyramid-noise levels (0=off)
    multires_discount: float = 0.3
    prediction_type: str = "epsilon"       # "epsilon" | "v"
    flow_shift: float = 1.0                # transformer families
    flux_guidance: float = 1.0             # embedded guidance (FLUX dev)
    prior_weight: float = 1.0              # DreamBooth prior-loss weight
    prior_batch_size: int = 0              # class rows/microbatch (0 = batch_size)
    caption_dropout: float = 0.0
    ema_decay: Optional[float] = None
    seed: int = 0
    remat: bool = True
    log_every: int = 10
    save_every: int = 0                    # orbax checkpoint cadence
    ckpt_dir: Optional[str] = None
    resume: bool = False
    # in-training validation sampling (train/validate.py)
    sample_every: int = 0
    sample_prompt: str = ""
    sample_steps: int = 20
    sample_resolution: int = 0             # 0 = 512
    sample_guidance: float = 7.5
    sample_seed: int = 42
    sample_dir: str = "val_samples"


def frozen_tower(pipe) -> Tuple[dict, str]:
    """(params, tower_name) of the trainable model: the UNet for the
    SDXL/SD1/SD2 pipelines, the DiT for SD3/Flux — tower_name is the
    export prefix io/lora.py resolves ('unet' | 'transformer')."""
    if hasattr(pipe, "unet_params"):
        return pipe.unet_params, "unet"
    if hasattr(pipe, "mmdit_params"):
        return pipe.mmdit_params, "transformer"
    if hasattr(pipe, "flux_params"):
        return pipe.flux_params, "transformer"
    raise TypeError(f"no trainable tower on {type(pipe).__name__}")


def _unet_loss_fn(pipe, cfg: FinetuneConfig):
    """loss(trainable, frozen, batch, key) for the UNet families
    (SDXL / SD1 / SD2).

    cfg.train_text_encoder: `frozen` is the composite
    {"unet", "clip", "open_clip"} tree and the batch carries single-chunk
    token ids + size/crop/ar — conditioning is recomputed IN-GRAPH by
    the factor-injected towers (pipeline/conditioning._embed_one, the
    same program inference runs), so tower gradients flow through the
    UNet's cross-attention into the TE factors."""
    from ..models.unet import unet_forward

    ucfg = pipe.diffuser_cfg.unet_config()
    alphas = jnp.asarray(pipe.alphas_cumprod)
    te = cfg.train_text_encoder
    if te:
        from ..pipeline.conditioning import AESTHETIC_SCORE, _embed_one

        e_cfg = pipe.embedder_cfg
    fwd = unet_forward
    if cfg.remat:
        fwd = jax.checkpoint(
            unet_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(trainable, x_t, t, batch):
        params = set_leaves(apply_fn.frozen, trainable)
        if te:
            emb = {"clip": params["clip"], "open_clip": params["open_clip"]}
            aesthetic = jnp.full((batch["size"].shape[0], 1),
                                 AESTHETIC_SCORE, batch["size"].dtype)
            ctx, _, label, _ = _embed_one(
                emb, e_cfg, batch["tok_clip"][:, None, :],
                batch["tok_oc"][:, None, :], batch["size"], batch["crop"],
                batch["ar"], aesthetic)
            unet_p = params["unet"]
        else:
            ctx, label = batch["ctx"], batch.get("label")
            unet_p = params
        return fwd(unet_p, ucfg, x_t.astype(pipe.compute_dtype), t,
                   ctx.astype(pipe.compute_dtype), label)

    def loss_fn(trainable, frozen, batch, key):
        apply_fn.frozen = frozen
        return diffusion_loss(
            apply_fn, trainable, alphas, batch, key,
            prediction_type=cfg.prediction_type,
            snr_gamma=cfg.snr_gamma, noise_offset=cfg.noise_offset,
            multires_iterations=cfg.multires_iterations,
            multires_discount=cfg.multires_discount)

    return loss_fn


def _mmdit_loss_fn(pipe, cfg: FinetuneConfig):
    """Rectified-flow loss for the SD3.x MMDiT; batch['label'] carries
    the dual-CLIP pooled vector."""
    from ..models.mmdit import mmdit_forward

    mcfg = pipe.mmdit_cfg
    fwd = mmdit_forward
    if cfg.remat:
        fwd = jax.checkpoint(
            mmdit_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(trainable, x_t, t, batch):
        params = set_leaves(apply_fn.frozen, trainable)
        return fwd(params, mcfg, x_t.astype(pipe.compute_dtype), t,
                   batch["ctx"].astype(pipe.compute_dtype),
                   batch["label"].astype(pipe.compute_dtype))

    def loss_fn(trainable, frozen, batch, key):
        apply_fn.frozen = frozen
        return flow_matching_loss(
            apply_fn, trainable, batch, key, shift=cfg.flow_shift)

    return loss_fn


def _flux_loss_fn(pipe, cfg: FinetuneConfig):
    """Rectified-flow loss for FLUX.1; the dev model's embedded guidance
    trains at cfg.flux_guidance (the public fine-tune recipe uses 1.0);
    schnell (no guidance_embeds) ignores it."""
    from ..models.flux import flux_forward

    fcfg = pipe.flux_cfg
    fwd = flux_forward
    if cfg.remat:
        fwd = jax.checkpoint(
            flux_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(trainable, x_t, t, batch):
        params = set_leaves(apply_fn.frozen, trainable)
        g = (jnp.full(t.shape, cfg.flux_guidance * 1000.0, jnp.float32)
             if fcfg.guidance_embeds else None)
        return fwd(params, fcfg, x_t.astype(pipe.compute_dtype), t,
                   batch["ctx"].astype(pipe.compute_dtype),
                   batch["label"].astype(pipe.compute_dtype), g)

    def loss_fn(trainable, frozen, batch, key):
        apply_fn.frozen = frozen
        return flow_matching_loss(
            apply_fn, trainable, batch, key, shift=cfg.flow_shift)

    return loss_fn


def loss_builder_for(pipe):
    if hasattr(pipe, "unet_params"):
        return _unet_loss_fn
    if hasattr(pipe, "mmdit_params"):
        return _mmdit_loss_fn
    return _flux_loss_fn


def encode_dataset_fm(
    pipe, dataset_dir: str, resolution: int, chunk: int = 4,
) -> EncodedDataset:
    """encode_dataset for the transformer families (SD3 / Flux): the
    16-ch shifted+scaled VAE latent, the T5(+CLIP) context stream as
    ctx, and the pooled vector in the label slot."""
    from ..models.vae import encode_image

    items = list_image_folder(dataset_dir)
    log(f"dataset: {len(items)} images @ {resolution}px from {dataset_dir}")
    is_sd3 = hasattr(pipe, "mmdit_params")

    def encode_prompts(prompts):
        if is_sd3:
            # SD3 conditioning returns [uncond | cond]; keep cond rows
            ctx, pooled = pipe.conditioning(prompts, negative_prompt="")
            return ctx[len(prompts):], pooled[len(prompts):]
        return pipe.conditioning(prompts, negative_prompt=None)

    encode = jax.jit(lambda imgs: (encode_image(
        pipe.vae_params, pipe.vae_cfg,
        imgs.astype(jnp.float32) / 255.0 * 2.0 - 1.0,
    ) - pipe.shift_factor) * pipe.scale_factor)

    lat_chunks, ctx_chunks, pool_chunks = [], [], []
    for i in range(0, len(items), chunk):
        part = items[i:i + chunk]
        imgs = jnp.asarray(
            np.stack([load_image_rgb(p, resolution) for p, _ in part]))
        lat_chunks.append(np.asarray(encode(imgs), np.float32))
        ctx, pooled = encode_prompts([c for _, c in part])
        ctx_chunks.append(np.asarray(ctx, np.float32))
        pool_chunks.append(np.asarray(pooled, np.float32))

    u_ctx, u_pool = encode_prompts([""])
    return EncodedDataset(
        latents=np.concatenate(lat_chunks, 0),
        ctx=np.concatenate(ctx_chunks, 0),
        label=np.concatenate(pool_chunks, 0),
        uncond_ctx=np.asarray(u_ctx, np.float32)[0],
        uncond_label=np.asarray(u_pool, np.float32)[0],
        captions=[c for _, c in items],
    )


def _draw_batch(data, prior, cfg: FinetuneConfig, rng) -> dict:
    """One (possibly accum-stacked) training batch. Without a prior set
    this is the original single gather + reshape; with one, each
    microbatch is an instance+class composition (sample_batch_prior).
    BucketedDataset: the step's bucket is drawn first, weighted by image
    count (kohya semantics); all microbatches of one step share the
    bucket so the jitted step sees ONE static shape per call."""
    if isinstance(data, BucketedDataset):
        w = np.asarray([b.n for b in data.buckets], np.float64)
        bi = int(rng.choice(len(data.buckets), p=w / w.sum()))
        data = data.buckets[bi]
    if prior is None:
        batch = sample_batch(
            data, cfg.batch_size * cfg.accum, rng, cfg.caption_dropout)
        if cfg.accum > 1:
            batch = {k: v.reshape((cfg.accum, cfg.batch_size) + v.shape[1:])
                     for k, v in batch.items()}
        return batch
    pb = cfg.prior_batch_size or cfg.batch_size
    parts = [
        sample_batch_prior(data, prior, cfg.batch_size, pb, rng,
                           cfg.caption_dropout, cfg.prior_weight)
        for _ in range(cfg.accum)
    ]
    if cfg.accum == 1:
        return parts[0]
    return {k: np.stack([p[k] for p in parts]) for k in parts[0]}


def _run_loop(step, state, start, frozen, data, cfg: FinetuneConfig,
              prior=None, val_fn=None):
    """The shared host-side training loop: numpy batch gathers -> the one
    jitted step; loss logging, cadenced orbax checkpoints. Returns the
    final TrainState."""
    rng = np.random.default_rng(cfg.seed + 1)
    # replay batch draws consumed by a resumed run (the host rng is part
    # of the training state semantically; cheap: index draws only)
    for _ in range(start):
        _draw_batch(data, prior, cfg, rng)

    key = jax.random.PRNGKey(cfg.seed + 2)
    t0, ema_loss = time.time(), None
    for i in range(start, cfg.steps):
        batch = _draw_batch(data, prior, cfg, rng)
        state, loss = step(state, frozen, batch,
                           jax.random.fold_in(key, i))
        if i == start:
            jax.block_until_ready(loss)
            log(f"step {i}: compiled + first step in {time.time()-t0:.1f}s")
        loss = float(loss)
        ema_loss = loss if ema_loss is None else 0.98 * ema_loss + 0.02 * loss
        if cfg.log_every and (i + 1) % cfg.log_every == 0:
            rate = (i + 1 - start) / max(time.time() - t0, 1e-9)
            log(f"step {i+1}/{cfg.steps}: loss {loss:.4f} "
                f"(ema {ema_loss:.4f}), {rate:.2f} it/s")
        if (cfg.save_every and cfg.ckpt_dir
                and (i + 1) % cfg.save_every == 0):
            from .checkpoint import save_train_state

            save_train_state(cfg.ckpt_dir, state)
            log(f"checkpoint @ step {i+1} -> {cfg.ckpt_dir}")
        if (val_fn is not None and cfg.sample_every
                and (i + 1) % cfg.sample_every == 0):
            val_fn(i + 1, state)
    return state


def _maybe_resume(state, cfg: FinetuneConfig):
    if cfg.resume and cfg.ckpt_dir:
        from .checkpoint import latest_step, restore_train_state

        if latest_step(cfg.ckpt_dir) is not None:
            state = restore_train_state(cfg.ckpt_dir, state)
            log(f"resumed from {cfg.ckpt_dir} @ step {int(state.step)}")
    return state, int(state.step)


def finetune_lora(
    pipe, data: EncodedDataset, cfg: FinetuneConfig,
    loss_builder=None, prior_data: Optional[EncodedDataset] = None,
    val_fn=None,
) -> Tuple[dict, Optional[dict]]:
    """Run the LoRA fine-tune; returns (factors, ema_factors|None).

    The frozen tower is whatever the pipeline loaded (bf16, possibly
    int8/int4-quantized = QLoRA); factors are f32 and the only trainable
    leaves. One jitted step; batches are host numpy gathers.
    prior_data: optional DreamBooth class set — every microbatch becomes
    instance+class rows with the composed prior-preservation loss."""
    if loss_builder is None:
        loss_builder = loss_builder_for(pipe)
    frozen, _tower = frozen_tower(pipe)
    if cfg.train_text_encoder:
        if _tower != "unet" or not hasattr(
                getattr(pipe, "embedder_cfg", None), "clip_config"):
            raise ValueError(
                "--train-text-encoder is the SDXL-family dual-tower "
                "recipe (UNet pipelines with a clip+open_clip embedder)")
        if pipe.diffuser_cfg.prediction_type == "v":
            raise ValueError("--train-text-encoder with v-prediction is "
                             "untested; train the UNet alone")
        # composite frozen tree: the preset regex matches the towers'
        # attn/mlp linears through the prefix (paths are searched, not
        # anchored), so one init_lora covers all three towers
        frozen = {"unet": frozen,
                  "clip": pipe.embedder_params["clip"],
                  "open_clip": pipe.embedder_params["open_clip"]}
    flat = init_lora(
        frozen, cfg.rank, jax.random.PRNGKey(cfg.seed),
        targets=cfg.targets)
    n_factors = sum(int(np.prod(v.shape)) for v in flat.values())
    n_te = sum(1 for k in flat if not k.startswith("unet.")) // 2 \
        if cfg.train_text_encoder else 0
    log(f"lora: rank {cfg.rank}, {len(flat) // 2} sites"
        + (f" ({n_te} text-encoder)" if n_te else "")
        + f", {n_factors / 1e6:.2f}M trainable params "
        f"(targets={cfg.targets})")

    tx = adamw_cosine(
        cfg.lr, cfg.schedule_steps or cfg.steps, warmup=cfg.warmup,
        weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip)
    if cfg.train_text_encoder and cfg.te_lr and cfg.te_lr != cfg.lr:
        # kohya's separate text-encoder LR: per-group AdamW chains (the
        # global-norm clip becomes per-group — the standard multi-lr
        # tradeoff)
        import optax

        tx = optax.multi_transform(
            {"unet": tx,
             "te": adamw_cosine(
                 cfg.te_lr, cfg.schedule_steps or cfg.steps,
                 warmup=cfg.warmup, weight_decay=cfg.weight_decay,
                 grad_clip=cfg.grad_clip)},
            {k: ("unet" if k.startswith("unet.") else "te")
             for k in flat},
        )
    state = TrainState.create(flat, tx, ema=cfg.ema_decay is not None)
    state, start = _maybe_resume(state, cfg)

    loss_fn = loss_builder(pipe, cfg)
    step = jax.jit(make_train_step(
        loss_fn, tx, ema_decay=cfg.ema_decay, accum=cfg.accum),
        donate_argnums=(0,))

    if val_fn is None and cfg.sample_every:
        from .validate import make_validation_sampler

        val_fn = make_validation_sampler(pipe, cfg, "lora",
                                         out_dir=cfg.sample_dir)
    state = _run_loop(step, state, start, frozen, data, cfg,
                      prior=prior_data, val_fn=val_fn)
    return (jax.device_get(state.params),
            jax.device_get(state.ema) if state.ema is not None else None)


def finetune_full(
    pipe, data: EncodedDataset, cfg: FinetuneConfig,
    loss_builder=None, mesh=None,
    prior_data: Optional[EncodedDataset] = None,
    val_fn=None,
) -> dict:
    """Full-parameter fine-tune (train/full.py); returns the trained
    tower pytree (original dtypes — ready for export/serving).

    Optimizer: cfg.optimizer — "adafactor" (factored second moment, the
    single-chip default for big towers) or "adamw". With ``mesh``, the
    master weights + optimizer state take the ZeRO-1 layout (sharded
    over the data axis) and the step jits under the mesh."""
    from .full import (
        adafactor_sched,
        full_trainable,
        merge_trained,
        shard_state_zero1,
        wrap_loss_full,
        zero_shardings,
    )

    if loss_builder is None:
        loss_builder = loss_builder_for(pipe)
    frozen, _tower = frozen_tower(pipe)
    m_dtype = jnp.float32 if cfg.master_dtype == "f32" else jnp.bfloat16
    master, dtypes, template = full_trainable(frozen, m_dtype)
    n_tr = sum(int(np.prod(v.shape)) for v in master.values())
    log(f"full fine-tune: {len(master)} leaves, {n_tr/1e6:.1f}M trainable "
        f"params (master {cfg.master_dtype}, {cfg.optimizer})")

    if cfg.optimizer == "adafactor":
        tx = adafactor_sched(
            cfg.lr, cfg.schedule_steps or cfg.steps, warmup=cfg.warmup,
            weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip)
    else:
        tx = adamw_cosine(
            cfg.lr, cfg.schedule_steps or cfg.steps, warmup=cfg.warmup,
            weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip)
    state = TrainState.create(master, tx, ema=cfg.ema_decay is not None)
    if mesh is not None:
        state = shard_state_zero1(state, mesh)
    state, start = _maybe_resume(state, cfg)

    loss_fn = wrap_loss_full(loss_builder(pipe, cfg), dtypes)
    jit_kwargs = dict(donate_argnums=(0,))
    if mesh is not None:
        jit_kwargs.update(
            out_shardings=(zero_shardings(state, mesh), None))
    step = jax.jit(make_train_step(
        loss_fn, tx, ema_decay=cfg.ema_decay, accum=cfg.accum),
        **jit_kwargs)

    if val_fn is None and cfg.sample_every:
        from .validate import make_validation_sampler

        val_fn = make_validation_sampler(pipe, cfg, "full",
                                         out_dir=cfg.sample_dir,
                                         dtypes=dtypes)
    state = _run_loop(step, state, start, template, data, cfg,
                      prior=prior_data, val_fn=val_fn)
    final = state.ema if state.ema is not None else state.params
    return merge_trained(frozen, jax.device_get(final), dtypes)


def export_adapter(path: str, factors: dict, pipe, fmt: str = "kohya",
                   metadata: Optional[dict] = None) -> None:
    """Write trained factors as a .safetensors the inference `--lora`
    path loads back exactly (round-trip tested in test_train_lora.py).

    Composite --train-text-encoder factors (keys prefixed unet./clip./
    open_clip.) export each tower separately — te1 and te2 have
    IDENTICAL relative paths (blocks.i.attn.q), so they cannot share one
    lora_state_dict call — and merge into one file with the ecosystem
    prefixes (kohya lora_unet_/lora_te1_/lora_te2_, peft unet./
    text_encoder./text_encoder_2.)."""
    from safetensors.numpy import save_file

    from .lora import lora_state_dict

    if any(k.startswith(("clip.", "open_clip.")) for k in factors):
        tree, _ = frozen_tower(pipe)
        groups = {"unet": {}, "te1": {}, "te2": {}}
        for k, v in factors.items():
            if k.startswith("unet."):
                groups["unet"][k[len("unet."):]] = v
            elif k.startswith("clip."):
                groups["te1"][k[len("clip."):]] = v
            elif k.startswith("open_clip."):
                groups["te2"][k[len("open_clip."):]] = v
            else:
                raise KeyError(f"unroutable composite factor {k}")
        trees = {"unet": tree,
                 "te1": pipe.embedder_params["clip"],
                 "te2": pipe.embedder_params["open_clip"]}
        tensors = {}
        for tower, flat in groups.items():
            if flat:
                tensors.update(
                    lora_state_dict(flat, {tower: trees[tower]}, fmt=fmt))
        save_file(tensors, path, metadata=metadata or {"format": "pt"})
    else:
        tree, tower = frozen_tower(pipe)
        export_lora(path, factors, {tower: tree}, fmt=fmt,
                    metadata=metadata)
    log(f"wrote LoRA adapter: {path}")
