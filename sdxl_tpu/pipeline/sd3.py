"""SD3 family pipeline: prompt -> PNG via MMDiT + flow matching.

Capability extension beyond the reference (SDXL/SD1/SD2); mirrors the
public StableDiffusion3Pipeline semantics:

  conditioning = [CLIP-L penultimate hidden (768) ⧺ CLIP-G penultimate
  hidden (1280)] zero-padded to 4096 ⧺ T5 final hidden (256 tokens of
  4096), pooled = CLIP-L pooled ⧺ CLIP-G pooled (2048). Running without
  the T5 tower (the supported memory-saving mode) substitutes zeros for
  its token block. CFG is pair-batched ([uncond | cond]) in one MMDiT
  call; the whole flow-matching Euler loop is one lax.scan
  (pipeline/flow_match.py).

  VAE: 16-channel latents; decode divides by scaling_factor (1.5305) and
  adds shift_factor (0.0609); encode uses the posterior MEAN (like the
  reference's SDXL encode path) then (z - shift) * scale.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    AutoencoderConfig,
    CLIPConfig,
    MMDiTConfig,
    OPEN_CLIP_BIGG_CONFIG,
    SD3_FLOW_SHIFT,
    SD3_VAE_SCALE,
    SD3_VAE_SHIFT,
    T5Config,
)
from ..models.clip import clip_hidden_pooled
from ..models.mmdit import mmdit_forward
from ..models.t5 import t5_encode
from ..models.vae import decode_latent, encode_image
from ..tokenizer import ClipTokenizer, OpenClipTokenizer
from ..utils import StageTimer, fence, log
from .flow_match import (
    fm_add_noise,
    fm_diffuse_latent,
    fm_schedule,
    fm_window,
)

SD3_T5_TOKENS = 256  # max_sequence_length of the public pipeline


@functools.partial(jax.jit, static_argnames=("cfg",))
def sd3_decode_latent(vae_params, cfg, latent, scale_factor, shift_factor):
    """16-ch latent -> uint8 RGB: z = latent/scale + shift, then the VAE
    decoder (the public pipeline's decode normalization)."""
    z = latent.astype(jnp.float32) / scale_factor + shift_factor
    img = decode_latent(vae_params, cfg, z)
    img = (img + 1.0) * (255.0 / 2.0)
    return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)


def sd3_vae_config() -> AutoencoderConfig:
    return AutoencoderConfig(n_channels_out=32, latent_channels=16)


@dataclass
class SD3Pipeline:
    mmdit_cfg: MMDiTConfig
    mmdit_params: dict
    clip_l_cfg: CLIPConfig
    clip_l_params: dict
    clip_g_cfg: CLIPConfig
    clip_g_params: dict
    vae_cfg: AutoencoderConfig
    vae_params: dict
    # T5 tower is optional (the public pipeline's drop-T5 mode)
    t5_cfg: Optional[T5Config] = None
    t5_params: Optional[dict] = None
    # callable: list[str] -> [B, SD3_T5_TOKENS] int32 token ids
    t5_tokenize: Optional[object] = None
    clip_tokenizer: ClipTokenizer = None
    open_clip_tokenizer: OpenClipTokenizer = None
    scale_factor: float = SD3_VAE_SCALE
    shift_factor: float = SD3_VAE_SHIFT
    flow_shift: float = SD3_FLOW_SHIFT
    compute_dtype: jnp.dtype = jnp.bfloat16
    timer: StageTimer = field(default_factory=StageTimer)

    # (data, model) mesh set by .shard(); None = single device
    mesh: Optional[object] = None

    def shard(self, n_data: Optional[int] = None,
              n_model: Optional[int] = None,
              tensor_parallel: bool = True):
        """Place the SD3 pipeline on a (data, model) mesh
        (parallel/mesh.py): MMDiT joint-attention/MLP linears
        tensor-parallel over the model axis (24 heads x 64 — head-aligned
        for any power-of-two tp), T5 likewise, CLIP towers per their head
        geometry, VAE replicated. XLA GSPMD inserts all ICI collectives."""
        from ..parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(n_data, n_model)
        self.mesh = mesh
        self.mmdit_params = shard_params(
            self.mmdit_params, mesh, tensor_parallel,
            head_channels=self.mmdit_cfg.head_dim,
            fixed_heads=self.mmdit_cfg.n_heads,
        )
        if self.t5_params is not None:
            self.t5_params = shard_params(
                self.t5_params, mesh, tensor_parallel,
                head_channels=self.t5_cfg.d_kv,
                fixed_heads=self.t5_cfg.n_heads,
            )
        self.clip_l_params = shard_params(
            self.clip_l_params, mesh, tensor_parallel,
            fixed_heads=self.clip_l_cfg.n_head)
        self.clip_g_params = shard_params(
            self.clip_g_params, mesh, tensor_parallel,
            fixed_heads=self.clip_g_cfg.n_head)
        self.vae_params = shard_params(self.vae_params, mesh, False)
        log(f"sd3 pipeline sharded over mesh {dict(mesh.shape)}")
        return mesh

    # ------------------------------------------------------------------
    def _ids77(self, tokenizer, texts, n_ctx):
        from ..tokenizer.bpe import tokenize_text

        rows = [tokenize_text(t, tokenizer, n_ctx) for t in texts]
        return jnp.asarray(np.asarray(rows, np.int32))

    def _encode_prompts(self, texts):
        """[B, 77+256, 4096] token stream + [B, 2048] pooled."""
        ids_l = self._ids77(self.clip_tokenizer, texts,
                            self.clip_l_cfg.n_ctx)
        ids_g = self._ids77(self.open_clip_tokenizer, texts,
                            self.clip_g_cfg.n_ctx)
        # penultimate hidden states (the SD3 pipeline's hidden_states[-2])
        h_l, pool_l = clip_hidden_pooled(
            self.clip_l_params, self.clip_l_cfg, ids_l,
            self.clip_l_cfg.n_layer - 1)
        h_g, pool_g = clip_hidden_pooled(
            self.clip_g_params, self.clip_g_cfg, ids_g,
            self.clip_g_cfg.n_layer - 1)
        clip_ctx = jnp.concatenate([h_l, h_g], axis=-1)
        jdim = self.mmdit_cfg.joint_attention_dim
        clip_ctx = jnp.pad(
            clip_ctx, ((0, 0), (0, 0), (0, jdim - clip_ctx.shape[-1]))
        )
        b = clip_ctx.shape[0]
        if self.t5_params is not None:
            if self.t5_tokenize is None:
                raise ValueError("T5 tower loaded but no T5 tokenizer — "
                                 "pass t5_tokenize or drop the tower")
            t5_ids = jnp.asarray(self.t5_tokenize(list(texts)))
            t5_ctx = t5_encode(self.t5_params, self.t5_cfg, t5_ids)
        else:
            t5_ctx = jnp.zeros((b, SD3_T5_TOKENS, jdim), clip_ctx.dtype)
        ctx = jnp.concatenate([clip_ctx, t5_ctx.astype(clip_ctx.dtype)],
                              axis=1)
        pooled = jnp.concatenate([pool_l, pool_g], axis=-1)
        return ctx, pooled

    def conditioning(self, prompts, negative_prompt: str = ""):
        """([2B, T, 4096] ctx, [2B, 2048] pooled) as [uncond | cond]."""
        if isinstance(prompts, str):
            prompts = [prompts]
        with self.timer.stage("embedder"):
            ctx_c, pool_c = self._encode_prompts(prompts)
            ctx_u, pool_u = self._encode_prompts(
                [negative_prompt] * len(prompts))
            ctx = jnp.concatenate([ctx_u, ctx_c], axis=0)
            pooled = jnp.concatenate([pool_u, pool_c], axis=0)
            fence(ctx)
        return ctx, pooled

    # ------------------------------------------------------------------
    def _decode(self, latent):
        return sd3_decode_latent(self.vae_params, self.vae_cfg, latent,
                                 self.scale_factor, self.shift_factor)

    def _slg_kwargs(self, scale, layers, start, stop) -> dict:
        """Skip-layer guidance kwargs for fm_diffuse_latent. scale=0 is
        the exact plain run (no perturbed branch is even built); the
        default layer set (7, 8, 9) is diffusers' SD3.5-medium
        recommendation."""
        if not scale:
            return {}
        layers = (7, 8, 9) if layers is None else tuple(layers)
        if any(i >= self.mmdit_cfg.num_layers or i < 0 for i in layers):
            raise ValueError(
                f"slg_layers {layers} out of range for a "
                f"{self.mmdit_cfg.num_layers}-block MMDiT")
        return dict(slg_scale=float(scale), slg_layers=layers,
                    slg_start=float(start), slg_stop=float(stop))

    def txt2img(
        self,
        prompts,
        resolution: Tuple[int, int] = (1024, 1024),
        n_steps: int = 28,
        guidance_scale: float = 7.0,
        seed: int = 0,
        negative_prompt: str = "",
        no_cfg: bool = False,
        slg_scale: float = 0.0,
        slg_layers: Optional[Tuple[int, ...]] = None,
        slg_start: float = 0.01,
        slg_stop: float = 0.2,
        device_output: bool = False,
    ) -> np.ndarray:
        h, w = resolution
        if h % 16 or w % 16:
            raise ValueError(f"resolution {h}x{w} must be a multiple of 16 "
                             "(patchified 16-ch latent)")
        if isinstance(prompts, str):
            prompts = [prompts]
        use_cfg = not (no_cfg or guidance_scale == 1.0)
        ctx, pooled = self.conditioning(prompts, negative_prompt)
        if not use_cfg:
            b = len(prompts)
            ctx, pooled = ctx[b:], pooled[b:]
        shape = (h // 8, w // 8, self.mmdit_cfg.in_channels)
        if isinstance(seed, (int, np.integer)):
            lat = jax.random.normal(jax.random.PRNGKey(seed),
                                    (len(prompts),) + shape, jnp.float32)
        else:
            # per-image seeds: image i's noise depends only on seeds[i]
            # (the fused-serving contract, same as the SDXL pipeline)
            seeds = list(seed)
            if len(seeds) != len(prompts):
                raise ValueError(f"{len(seeds)} seeds for "
                                 f"{len(prompts)} prompts")
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            lat = jax.vmap(
                lambda k: jax.random.normal(k, shape, jnp.float32))(keys)
        with self.timer.stage("diffuser"):
            lat = fm_diffuse_latent(
                self.mmdit_params, self.mmdit_cfg, lat, ctx, pooled,
                guidance_scale, n_steps=n_steps, shift=self.flow_shift,
                compute_dtype=self.compute_dtype, use_cfg=use_cfg,
                **self._slg_kwargs(slg_scale, slg_layers, slg_start,
                                   slg_stop),
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)

    def img2img(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        strength: float = 0.6,
        n_steps: int = 28,
        guidance_scale: float = 7.0,
        seed: int = 0,
        negative_prompt: str = "",
        no_cfg: bool = False,
        slg_scale: float = 0.0,
        slg_layers: Optional[Tuple[int, ...]] = None,
        slg_start: float = 0.01,
        slg_stop: float = 0.2,
        device_output: bool = False,
    ) -> np.ndarray:
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        if isinstance(prompts, str):
            prompts = [prompts]
        use_cfg = not (no_cfg or guidance_scale == 1.0)
        ctx, pooled = self.conditioning(prompts, negative_prompt)
        if not use_cfg:
            b = len(prompts)
            ctx, pooled = ctx[b:], pooled[b:]
        with self.timer.stage("vae_encode"):
            x = (jnp.asarray(reference_images).astype(jnp.float32) / 255.0
                 * 2.0 - 1.0)
            z = encode_image(self.vae_params, self.vae_cfg, x)
            lat0 = (z - self.shift_factor) * self.scale_factor
        start = fm_window(n_steps, strength)
        _, sigmas = fm_schedule(n_steps, self.flow_shift)
        noise = jax.random.normal(jax.random.PRNGKey(seed), lat0.shape,
                                  jnp.float32)
        lat = fm_add_noise(lat0, noise, float(sigmas[start]))
        with self.timer.stage("diffuser"):
            lat = fm_diffuse_latent(
                self.mmdit_params, self.mmdit_cfg, lat, ctx, pooled,
                guidance_scale, n_steps=n_steps, shift=self.flow_shift,
                compute_dtype=self.compute_dtype, use_cfg=use_cfg,
                start_index=start,
                **self._slg_kwargs(slg_scale, slg_layers, slg_start,
                                   slg_stop),
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)

    def inpaint(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        mask_image: Optional[np.ndarray] = None,  # [H, W(,C)] u8, >127 = gen
        crop_left: Optional[int] = None,
        crop_right: Optional[int] = None,
        crop_top: Optional[int] = None,
        crop_bottom: Optional[int] = None,
        crop_out: bool = False,
        mask_blur: float = 0.0,
        strength: float = 1.0,
        n_steps: int = 28,
        guidance_scale: float = 7.0,
        seed: int = 0,
        negative_prompt: str = "",
        no_cfg: bool = False,
        slg_scale: float = 0.0,
        slg_layers: Optional[Tuple[int, ...]] = None,
        slg_start: float = 0.01,
        slg_stop: float = 0.2,
        device_output: bool = False,
    ) -> np.ndarray:
        """Latent inpainting for the SD3 family.

        Masked-region semantics are diffusers' SD3 inpaint blending (see
        pipeline/flow_match.py): after every Euler step the un-masked
        region is re-pinned to the reference latent re-noised at the next
        sigma. The mask comes from either a mask IMAGE (any >127 pixel in
        an 8x8 cell marks the cell generated) or a pixel crop WINDOW
        (reference sample/main.rs:135-197 semantics, shared with the SDXL
        family's pipe.inpaint). strength defaults to 1.0 (full schedule,
        like the SDXL crop-inpaint path); diffusers' pipeline default is
        0.6 — pass strength= for that behavior.
        """
        from .masks import build_latent_mask

        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        if isinstance(prompts, str):
            prompts = [prompts]
        _, height, width, _ = np.asarray(reference_images).shape
        if height % 16 or width % 16:
            raise ValueError(f"reference image {height}x{width} must be a "
                             "multiple of 16 (patchified 16-ch latent)")
        mask = build_latent_mask(height, width, mask_image, crop_left,
                                 crop_right, crop_top, crop_bottom,
                                 crop_out, mask_blur=mask_blur)

        use_cfg = not (no_cfg or guidance_scale == 1.0)
        ctx, pooled = self.conditioning(prompts, negative_prompt)
        if not use_cfg:
            b = len(prompts)
            ctx, pooled = ctx[b:], pooled[b:]
        with self.timer.stage("vae_encode"):
            x = (jnp.asarray(reference_images).astype(jnp.float32) / 255.0
                 * 2.0 - 1.0)
            z = encode_image(self.vae_params, self.vae_cfg, x)
            lat0 = (z - self.shift_factor) * self.scale_factor
        start = fm_window(n_steps, strength)
        _, sigmas = fm_schedule(n_steps, self.flow_shift)
        noise = jax.random.normal(jax.random.PRNGKey(seed), lat0.shape,
                                  jnp.float32)
        lat = fm_add_noise(lat0, noise, float(sigmas[start]))
        with self.timer.stage("diffuser"):
            lat = fm_diffuse_latent(
                self.mmdit_params, self.mmdit_cfg, lat, ctx, pooled,
                guidance_scale, n_steps=n_steps, shift=self.flow_shift,
                compute_dtype=self.compute_dtype, use_cfg=use_cfg,
                start_index=start, pin_reference=lat0, pin_mask=mask,
                pin_noise=noise,
                **self._slg_kwargs(slg_scale, slg_layers, slg_start,
                                   slg_stop),
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------


def random_sd3_pipeline(
    seed: int = 0,
    mmdit_cfg: Optional[MMDiTConfig] = None,
    clip_l_cfg: CLIPConfig = CLIPConfig(),
    clip_g_cfg: CLIPConfig = OPEN_CLIP_BIGG_CONFIG,
    vae_cfg: Optional[AutoencoderConfig] = None,
    t5_cfg: Optional[T5Config] = None,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
) -> SD3Pipeline:
    """SD3 pipeline with random weights (bring-up / tests / bench)."""
    from ..models.clip import init_clip
    from ..models.mmdit import init_mmdit
    from ..models.t5 import init_t5
    from ..models.vae import init_autoencoder

    mmdit_cfg = mmdit_cfg or MMDiTConfig()
    vae_cfg = vae_cfg or sd3_vae_config()
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    j_clip = jax.jit(init_clip, static_argnums=(1, 2))
    j_mmdit = jax.jit(init_mmdit, static_argnums=(1, 2))
    j_vae = jax.jit(init_autoencoder, static_argnums=(1,))
    t5_params = None
    t5_tok = None
    if t5_cfg is not None:
        t5_params = jax.jit(init_t5, static_argnums=(1, 2))(ks[3], t5_cfg)

        def t5_tok(texts):  # test stub: deterministic ids from text hash
            out = np.zeros((len(texts), SD3_T5_TOKENS), np.int32)
            for i, t in enumerate(texts):
                h = abs(hash(t))
                out[i, : min(8, SD3_T5_TOKENS)] = [
                    (h >> (4 * j)) % t5_cfg.vocab_size for j in range(8)
                ]
            return out

    return SD3Pipeline(
        mmdit_cfg=mmdit_cfg,
        mmdit_params=j_mmdit(ks[0], mmdit_cfg, jnp.bfloat16),
        clip_l_cfg=clip_l_cfg,
        clip_l_params=j_clip(ks[1], clip_l_cfg, jnp.float32),
        clip_g_cfg=clip_g_cfg,
        clip_g_params=j_clip(ks[2], clip_g_cfg, jnp.float32),
        vae_cfg=vae_cfg,
        vae_params=j_vae(jax.random.fold_in(ks[0], 7), vae_cfg),
        t5_cfg=t5_cfg,
        t5_params=t5_params,
        t5_tokenize=t5_tok,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
        compute_dtype=compute_dtype,
    )


def load_sd3_pipeline(
    model_dir: str,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    load_t5: bool = True,
    t5_tokenize: Optional[object] = None,
    loras=None,
    quantize: Optional[str] = None,
) -> SD3Pipeline:
    """Load a diffusers-layout SD3 directory
    (stabilityai/stable-diffusion-3-medium-diffusers style).

    load_t5=False drops the T5-XXL tower (the public pipeline's
    memory-saving mode: its token block becomes zeros). A checkpoint
    whose text_encoder_3/ weights load but whose tokenizer_3/ is absent
    fails HERE (not on the first request) unless a `t5_tokenize`
    callable is supplied.

    quantize="int8"|"int4" stores the MMDiT block linears quantized and
    the T5 tower at int8 (io/quantize.py) — weights are staged on the
    host and only the quantized form reaches HBM; LoRAs merge before
    quantization."""
    from ..io.sd3 import load_sd3_diffusers_dir

    log(f"loading SD3 diffusers checkpoint from {model_dir}")
    bits = None
    if quantize is not None:
        from ..io.quantize import parse_quantize_spec

        bits = parse_quantize_spec(quantize)
    (mmdit_cfg, mmdit, clip_l_cfg, clip_l, clip_g_cfg, clip_g, vae_cfg,
     vae, t5_cfg, t5_params, t5_tok, flow_shift) = load_sd3_diffusers_dir(
        model_dir, compute_dtype, load_t5, host=bits is not None)
    if t5_tok is None:
        t5_tok = t5_tokenize
    if t5_params is not None and t5_tok is None:
        raise ValueError(
            f"{model_dir}: text_encoder_3/ (T5) weights loaded but "
            "tokenizer_3/ is missing — add the tokenizer directory, pass "
            "t5_tokenize=, or drop the tower (load_t5=False / --no-t5)")
    if loras:
        from ..io.lora import apply_lora_files

        apply_lora_files(loras, transformer=mmdit, te1=clip_l, te2=clip_g)
    if bits is not None:
        from ..io.quantize import quantize_tree
        from ..utils.memory import tree_to_device

        mmdit = tree_to_device(quantize_tree(mmdit, bits))
        if t5_params is not None:
            t5_params = tree_to_device(quantize_tree(t5_params, 8))
    return SD3Pipeline(
        mmdit_cfg=mmdit_cfg,
        mmdit_params=mmdit,
        clip_l_cfg=clip_l_cfg,
        clip_l_params=clip_l,
        clip_g_cfg=clip_g_cfg,
        clip_g_params=clip_g,
        vae_cfg=vae_cfg,
        vae_params=vae,
        t5_cfg=t5_cfg,
        t5_params=t5_params,
        t5_tokenize=t5_tok,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
        flow_shift=flow_shift,
        compute_dtype=compute_dtype,
    )
