"""Textual-inversion TRAINING (arXiv:2208.01618).

Capability extension: the inference side already loads trained concept
embeddings (io/textual_inversion.py, `--embedding PATH[:word]`); this
module produces them. Closes the loop: a concept trained here exports to
the SAME file formats that loader (and the wider SD ecosystem) reads —
{"clip_l","clip_g"} safetensors for SDXL, {"emb_params"} for SD 1/2.

Design (TPU-first, same shape discipline as train/finetune.py):

  - The ONLY trainable leaves are the new embedding rows (`n_vectors`
    per text tower). Every step concatenates them onto the frozen token
    embedding table at trace time — `concat(base, rows)[ids]` — so
    gradients flow through the frozen text tower(s) and the frozen UNet
    into the rows alone. No gradient masking is needed: nothing else is
    a differentiable input.
  - The placeholder word is registered with the pipeline's tokenizer(s)
    (tokenizer/bpe.py register_custom_token) and encodes to pseudo-token
    ids directly above the base vocab — exactly the ids the inference
    loader allocates, so a trained file round-trips bit-for-bit
    (tests/test_train_ti.py).
  - Token ids are tokenized once on the host; each jitted step gathers a
    static-shaped [B, 1, 77] id batch, runs tower(s) + UNet, and takes
    the same DDPM eps/v loss the LoRA/full paths use (train/losses.py).
  - Row init copies the init word's first content-token embedding to all
    vectors (diffusers' initializer_token semantics); without an init
    word, rows draw from N(0, std(base table)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log
from .finetune import list_image_folder, load_image_rgb
from .losses import diffusion_loss
from .step import TrainState, adamw_cosine, make_train_step

# The TI paper / diffusers textual_inversion.py "object" template bank
# (public prompt strings; style training uses the style variants).
OBJECT_TEMPLATES = [
    "a photo of a {}",
    "a rendering of a {}",
    "a cropped photo of the {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a dark photo of the {}",
    "a photo of my {}",
    "a photo of the cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a cropped photo of a {}",
    "a photo of the {}",
    "a good photo of the {}",
    "a photo of one {}",
    "a close-up photo of the {}",
    "a rendition of the {}",
    "a rendition of a {}",
    "a photo of a nice {}",
    "a good photo of a {}",
    "a photo of the nice {}",
    "a photo of the small {}",
    "a photo of the large {}",
    "a photo of a cool {}",
]

STYLE_TEMPLATES = [
    "a painting in the style of {}",
    "a rendering in the style of {}",
    "a cropped painting in the style of {}",
    "the painting in the style of {}",
    "a clean painting in the style of {}",
    "a dark painting in the style of {}",
    "a picture in the style of {}",
    "a cool painting in the style of {}",
    "a close-up painting in the style of {}",
    "a bright painting in the style of {}",
    "a good painting in the style of {}",
    "a rendition in the style of {}",
]


@dataclass
class TIConfig:
    placeholder: str = "<concept>"
    n_vectors: int = 1
    init_word: Optional[str] = None
    templates: str = "object"          # "object" | "style" | "captions"
    steps: int = 500
    batch_size: int = 1
    lr: float = 5e-4                   # TI trains hot (paper: 5e-3 .. 5e-4)
    warmup: int = 0
    grad_clip: Optional[float] = 1.0
    prediction_type: str = "epsilon"
    noise_offset: float = 0.0
    seed: int = 0
    remat: bool = True
    log_every: int = 25


@dataclass
class TIDataset:
    latents: np.ndarray                 # [N, h, w, c] VAE-scaled
    tokens: Dict[str, np.ndarray]       # tower -> [M, 1, 77] ids
    per_image: bool                     # tokens aligned with latents?
    resolution: int

    @property
    def n(self) -> int:
        return self.latents.shape[0]


def _towers(pipe) -> Dict[str, tuple]:
    """tower key -> (tokenizer, n_ctx). SDXL has two towers; SD1/2 one."""
    if getattr(pipe, "open_clip_tokenizer", None) is not None:
        return {
            "clip": (pipe.clip_tokenizer, pipe.embedder_cfg.clip_config.n_ctx),
            "open_clip": (pipe.open_clip_tokenizer,
                          pipe.embedder_cfg.open_clip_config.n_ctx),
        }
    return {"clip": (pipe.clip_tokenizer, pipe.embedder_cfg.n_ctx)}


def register_placeholder(pipe, cfg: TIConfig) -> Dict[str, List[int]]:
    """Register the placeholder with every tower tokenizer; returns the
    pseudo-token ids per tower (the same ids the inference loader would
    allocate for this word on a fresh pipeline)."""
    return {
        tower: tok.register_custom_token(cfg.placeholder, cfg.n_vectors)
        for tower, (tok, _) in _towers(pipe).items()
    }


def encode_ti_dataset(
    pipe, dataset_dir: str, resolution: int, cfg: TIConfig, chunk: int = 4,
) -> TIDataset:
    """Latents through the frozen VAE + host-tokenized prompt ids.

    templates="captions" uses the folder's caption files (each must
    contain the placeholder); otherwise every step pairs a random
    template (formatted with the placeholder) with a random image —
    the paper's recipe."""
    from ..pipeline.latent import encode_images_to_latent
    from ..tokenizer.bpe import tokenize_text

    register_placeholder(pipe, cfg)
    items = list_image_folder(dataset_dir)
    log(f"ti dataset: {len(items)} images @ {resolution}px")

    encode = jax.jit(lambda imgs: encode_images_to_latent(
        pipe.vae_params, pipe.vae_cfg, imgs, pipe.scale_factor))
    lat_chunks = []
    for i in range(0, len(items), chunk):
        part = items[i:i + chunk]
        imgs = jnp.asarray(
            np.stack([load_image_rgb(p, resolution) for p, _ in part]))
        lat_chunks.append(np.asarray(encode(imgs), np.float32))
    latents = np.concatenate(lat_chunks, 0)

    if cfg.templates == "captions":
        prompts = [c for _, c in items]
        missing = [p for p in prompts if cfg.placeholder not in p]
        if missing:
            raise ValueError(
                f"templates='captions' requires every caption to contain "
                f"the placeholder {cfg.placeholder!r}; missing in "
                f"{missing[:3]}")
        per_image = True
    else:
        bank = (STYLE_TEMPLATES if cfg.templates == "style"
                else OBJECT_TEMPLATES)
        prompts = [t.format(cfg.placeholder) for t in bank]
        per_image = False

    tokens = {}
    for tower, (tok, n_ctx) in _towers(pipe).items():
        tokens[tower] = np.asarray(
            [[tokenize_text(p, tok, n_ctx)] for p in prompts], np.int32)
    return TIDataset(latents=latents, tokens=tokens, per_image=per_image,
                     resolution=resolution)


def sample_ti_batch(data: TIDataset, batch_size: int,
                    rng: np.random.Generator) -> dict:
    idx = rng.integers(0, data.n, (batch_size,))
    m = next(iter(data.tokens.values())).shape[0]
    tidx = idx if data.per_image else rng.integers(0, m, (batch_size,))
    batch = {"latents": data.latents[idx]}
    for tower, toks in data.tokens.items():
        batch["tok_" + tower] = toks[tidx]
    return batch


# ---------------------------------------------------------------------------
# trainable rows
# ---------------------------------------------------------------------------


def _embed_table(pipe, tower: str) -> jnp.ndarray:
    ep = pipe.embedder_params
    node = ep[tower] if tower in ep else ep   # SD1: bare CLIP pytree
    return node["token_embedding"]


def init_ti_rows(pipe, cfg: TIConfig, key) -> Dict[str, jnp.ndarray]:
    """Fresh trainable rows per tower: the init word's first content
    token's embedding tiled n_vectors times (diffusers initializer_token
    semantics), or N(0, std(table)) without one."""
    from ..tokenizer.bpe import tokenize_text

    rows: Dict[str, jnp.ndarray] = {}
    for i, (tower, (tok, n_ctx)) in enumerate(_towers(pipe).items()):
        table = np.asarray(_embed_table(pipe, tower), np.float32)
        if cfg.init_word:
            ids = tok.encode(cfg.init_word, True, True)
            content = [t for t in ids
                       if t not in (tok.sot_token, tok.eot_token)]
            if not content:
                raise ValueError(
                    f"init word {cfg.init_word!r} has no content tokens")
            row = table[content[0]]
            rows[tower] = jnp.asarray(
                np.tile(row[None], (cfg.n_vectors, 1)), jnp.float32)
        else:
            std = float(table.std())
            rows[tower] = std * jax.random.normal(
                jax.random.fold_in(key, i),
                (cfg.n_vectors, table.shape[1]), jnp.float32)
    return rows


def _with_rows(node: dict, rows: jnp.ndarray) -> dict:
    emb = node["token_embedding"]
    return dict(node, token_embedding=jnp.concatenate(
        [emb, rows.astype(emb.dtype)], axis=0))


# ---------------------------------------------------------------------------
# losses (per family)
# ---------------------------------------------------------------------------


def _sdxl_ti_loss(pipe, cfg: TIConfig, resolution: int):
    from ..models.unet import unet_forward
    from ..pipeline.conditioning import AESTHETIC_SCORE, _embed_one

    e_cfg = pipe.embedder_cfg
    ucfg = pipe.diffuser_cfg.unet_config()
    alphas = jnp.asarray(pipe.alphas_cumprod)
    fwd = unet_forward
    if cfg.remat:
        fwd = jax.checkpoint(
            unet_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(rows, x_t, t, batch):
        ep = apply_fn.frozen["embedder"]
        ep2 = {
            "clip": _with_rows(ep["clip"], rows["clip"]),
            "open_clip": _with_rows(ep["open_clip"], rows["open_clip"]),
        }
        b = batch["tok_clip"].shape[0]
        size = jnp.full((b, 2), resolution, jnp.int32)
        crop = jnp.zeros((b, 2), jnp.int32)
        aesthetic = jnp.full((b, 1), AESTHETIC_SCORE, jnp.int32)
        ctx, _, label, _ = _embed_one(
            ep2, e_cfg, batch["tok_clip"], batch["tok_open_clip"],
            size, crop, size, aesthetic)
        return fwd(apply_fn.frozen["unet"], ucfg,
                   x_t.astype(pipe.compute_dtype), t,
                   ctx.astype(pipe.compute_dtype),
                   label.astype(pipe.compute_dtype))

    def loss_fn(rows, frozen, batch, key):
        apply_fn.frozen = frozen
        return diffusion_loss(
            apply_fn, rows, alphas, batch, key,
            prediction_type=cfg.prediction_type,
            noise_offset=cfg.noise_offset)

    return loss_fn


def _sd1_ti_loss(pipe, cfg: TIConfig, resolution: int):
    from ..models.clip import clip_final_hidden, clip_hidden
    from ..models.unet import unet_forward
    from ..ops.norms import layernorm_affine

    ccfg = pipe.embedder_cfg
    ucfg = pipe.diffuser_cfg.unet_config()
    alphas = jnp.asarray(pipe.alphas_cumprod)
    penultimate = bool(getattr(pipe, "penultimate_hidden", False))
    fwd = unet_forward
    if cfg.remat:
        fwd = jax.checkpoint(
            unet_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(rows, x_t, t, batch):
        cp = _with_rows(apply_fn.frozen["embedder"], rows["clip"])
        toks = batch["tok_clip"][:, 0]
        if penultimate:
            h = clip_hidden(cp, ccfg, toks, ccfg.n_layer - 1)
        else:
            h = clip_final_hidden(cp, ccfg, toks)
        return fwd(apply_fn.frozen["unet"], ucfg,
                   x_t.astype(pipe.compute_dtype), t,
                   h.astype(pipe.compute_dtype), None)

    def loss_fn(rows, frozen, batch, key):
        apply_fn.frozen = frozen
        return diffusion_loss(
            apply_fn, rows, alphas, batch, key,
            prediction_type=cfg.prediction_type,
            noise_offset=cfg.noise_offset)

    return loss_fn


# ---------------------------------------------------------------------------
# driver + export
# ---------------------------------------------------------------------------


def train_textual_inversion(
    pipe, data: TIDataset, cfg: TIConfig,
) -> Dict[str, np.ndarray]:
    """Train the concept rows; returns {tower: [n_vectors, d] f32}."""
    import time

    is_sdxl = getattr(pipe, "open_clip_tokenizer", None) is not None
    frozen = {"embedder": pipe.embedder_params, "unet": pipe.unet_params}
    rows = init_ti_rows(pipe, cfg, jax.random.PRNGKey(cfg.seed))
    n_tr = sum(int(np.prod(v.shape)) for v in rows.values())
    log(f"textual inversion: {cfg.placeholder!r}, {cfg.n_vectors} "
        f"vector(s)/tower, {n_tr} trainable params")

    build = _sdxl_ti_loss if is_sdxl else _sd1_ti_loss
    loss_fn = build(pipe, cfg, data.resolution)
    tx = adamw_cosine(cfg.lr, cfg.steps, warmup=cfg.warmup,
                      weight_decay=0.0, grad_clip=cfg.grad_clip)
    state = TrainState.create(rows, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(cfg.seed + 1)
    key = jax.random.PRNGKey(cfg.seed + 2)
    t0 = time.time()
    for i in range(cfg.steps):
        batch = sample_ti_batch(data, cfg.batch_size, rng)
        state, loss = step(state, frozen, batch, jax.random.fold_in(key, i))
        if i == 0:
            jax.block_until_ready(loss)
            log(f"ti step 0: compiled + first step in {time.time()-t0:.1f}s")
        if cfg.log_every and (i + 1) % cfg.log_every == 0:
            log(f"ti step {i+1}/{cfg.steps}: loss {float(loss):.4f}")
    return {k: np.asarray(v, np.float32)
            for k, v in jax.device_get(state.params).items()}


def export_ti(path: str, rows: Dict[str, np.ndarray],
              metadata: Optional[Dict[str, str]] = None) -> None:
    """Write the trained rows in the format io/textual_inversion.py (and
    the ecosystem) loads: SDXL two-tower {"clip_l","clip_g"}; single
    tower {"emb_params"} (the SD 1/2 convention)."""
    from safetensors.numpy import save_file

    if "open_clip" in rows:
        tensors = {"clip_l": np.ascontiguousarray(rows["clip"]),
                   "clip_g": np.ascontiguousarray(rows["open_clip"])}
    else:
        tensors = {"emb_params": np.ascontiguousarray(rows["clip"])}
    save_file(tensors, path, metadata=metadata or {"format": "pt"})
    log(f"wrote textual-inversion embedding: {path}")
