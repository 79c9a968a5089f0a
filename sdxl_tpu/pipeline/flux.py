"""Flux family pipeline: prompt -> PNG via the FLUX.1 transformer.

Capability extension beyond the reference (SDXL/SD1/SD2); mirrors the
public FluxPipeline semantics:

  conditioning = T5 final hidden (512 tokens dev / 256 schnell of 4096)
  as the token stream, CLIP-L pooler_output (UNPROJECTED — FluxPipeline
  uses CLIPTextModel, not WithProjection) as the pooled vector. There is
  NO classifier-free guidance: FLUX.1-dev is guidance-distilled (the
  guidance scale enters as a sinusoid embedding inside the transformer)
  and schnell ignores guidance entirely.

  schedule: sigmas = linspace(1, 1/n, n) with the DYNAMIC exp time shift
  sigma' = e^mu / (e^mu + (1/sigma - 1)), mu linear in the packed image
  token count between (256, base_shift) and (4096, max_shift) — the
  FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True) path.
  schnell uses the static shift (=1: identity). Euler updates
  x += (s' - s) * v; the whole loop is one lax.scan.

  VAE: 16-channel, no quant convs; decode z/scale + shift
  (scale 0.3611, shift 0.1159).
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
    FLUX_BASE_SHIFT,
    FLUX_MAX_SHIFT,
    FLUX_VAE_SCALE,
    FLUX_VAE_SHIFT,
    FluxConfig,
    T5Config,
)
from ..models.clip import clip_hidden_pooled
from ..models.flux import flux_forward
from ..models.t5 import t5_encode
from ..models.vae import encode_image
from ..tokenizer import ClipTokenizer
from ..utils import StageTimer, fence, log
from .flow_match import fm_add_noise, fm_window
from .sd3 import sd3_decode_latent


def flux_schedule(
    n_steps: int,
    image_seq_len: int,
    base_shift: float = FLUX_BASE_SHIFT,
    max_shift: float = FLUX_MAX_SHIFT,
    dynamic: bool = True,
    shift: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps [n] = sigma*1000, sigmas [n+1, trailing 0]), descending.

    Verbatim FluxPipeline + FlowMatchEulerDiscreteScheduler: the base
    grid is linspace(1, 1/n, n); with use_dynamic_shifting the exp shift
    applies with mu interpolated linearly in the PACKED image token
    count between (256, base_shift) and (4096, max_shift); without it
    the static rational shift applies (shift=1 -> identity, the schnell
    config)."""
    sigmas = np.linspace(1.0, 1.0 / n_steps, n_steps, dtype=np.float64)
    if dynamic:
        m = (max_shift - base_shift) / (4096 - 256)
        b = base_shift - m * 256
        mu = image_seq_len * m + b
        sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    timesteps = (sigmas * 1000.0).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return timesteps, sigmas


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "true_cfg"),
    donate_argnames=("latent",),
)
def flux_diffuse_latent(
    flux_params,
    cfg: FluxConfig,
    latent: jnp.ndarray,    # [B, h, w, 16] — noise at sigmas[0]
    context: jnp.ndarray,   # [B or 2B, T, joint_dim] T5 stream
    pooled: jnp.ndarray,    # [B or 2B, pooled_dim] CLIP-L pooled
    guidance: jnp.ndarray,  # [B] guidance_scale (dev; ignored by schnell)
    timesteps: jnp.ndarray,  # [n] sigma*1000
    sigmas: jnp.ndarray,     # [n+1]
    compute_dtype=jnp.bfloat16,
    pin_reference: Optional[jnp.ndarray] = None,  # [B,h,w,C] clean latent
    pin_mask: Optional[jnp.ndarray] = None,       # [1|B,h,w,1], 1 = generate
    pin_noise: Optional[jnp.ndarray] = None,      # [B,h,w,C]
    true_cfg: bool = False,
    true_cfg_scale: float = 1.0,
    cond_latent: Optional[jnp.ndarray] = None,    # [B,ch,cw,C] Kontext ref
) -> jnp.ndarray:
    """The flow-matching Euler loop as one lax.scan. By default there is
    no CFG pair — the guidance embedding replaces it (FLUX.1 is
    guidance-distilled). true_cfg=True is the public pipeline's
    true_cfg_scale path for negative prompts: context/pooled arrive as
    [uncond | cond] and v = vu + (vc - vu) * true_cfg_scale, pair-batched
    in one transformer call (the embedded guidance still applies to both
    halves, matching FluxPipeline).

    The pin_* triple is the diffusers FluxInpaintPipeline blending: after
    every Euler update the un-masked region is re-pinned to the clean
    reference re-noised at the NEXT sigma (the final step's sigma = 0
    collapses the formula to the reference exactly)."""
    latent = latent.astype(jnp.float32)
    ctx = context.astype(compute_dtype)
    pld = pooled.astype(compute_dtype)
    g = (guidance.astype(jnp.float32) * 1000.0
         if cfg.guidance_embeds else None)
    if true_cfg and g is not None:
        g = jnp.concatenate([g, g], axis=0)
    if pin_reference is not None:
        pin_ref = pin_reference.astype(jnp.float32)
        pin_m = pin_mask.astype(jnp.float32)
        pin_n = pin_noise.astype(jnp.float32)
    cond = (cond_latent.astype(compute_dtype)
            if cond_latent is not None else None)

    def velocity(lat, t):
        n_batch = lat.shape[0]
        if not true_cfg:
            t_vec = jnp.broadcast_to(t, (n_batch,))
            return flux_forward(
                flux_params, cfg, lat.astype(compute_dtype), t_vec, ctx,
                pld, guidance=g, cond_latent=cond).astype(jnp.float32)
        x2 = jnp.concatenate([lat, lat], axis=0).astype(compute_dtype)
        t2 = jnp.broadcast_to(t, (2 * n_batch,))
        c2 = (jnp.concatenate([cond, cond], axis=0)
              if cond is not None else None)
        v2 = flux_forward(flux_params, cfg, x2, t2, ctx, pld,
                          guidance=g, cond_latent=c2).astype(jnp.float32)
        vu, vc = jnp.split(v2, 2, axis=0)
        return vu + (vc - vu) * true_cfg_scale

    def step(lat, inp):
        t, s, s_next = inp
        v = velocity(lat, t)
        lat = lat + (s_next - s) * v
        if pin_reference is not None:
            proper = (1.0 - s_next) * pin_ref + s_next * pin_n
            lat = pin_m * lat + (1.0 - pin_m) * proper
        return lat, None

    latent, _ = jax.lax.scan(step, latent,
                             (timesteps, sigmas[:-1], sigmas[1:]))
    return latent


@dataclass
class FluxPipeline:
    flux_cfg: FluxConfig
    flux_params: dict
    clip_cfg: CLIPConfig
    clip_params: dict
    t5_cfg: T5Config
    t5_params: dict
    vae_cfg: AutoencoderConfig
    vae_params: dict
    # callable: list[str] -> [B, t5_tokens] int32 token ids
    t5_tokenize: object
    clip_tokenizer: ClipTokenizer = None
    t5_tokens: int = 512  # max_sequence_length (512 dev, 256 schnell)
    scale_factor: float = FLUX_VAE_SCALE
    shift_factor: float = FLUX_VAE_SHIFT
    base_shift: float = FLUX_BASE_SHIFT
    max_shift: float = FLUX_MAX_SHIFT
    dynamic_shifting: bool = True  # schnell ships with the static shift
    static_shift: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    timer: StageTimer = field(default_factory=StageTimer)

    # T5 stays parked in HOST memory and is shipped to the device only
    # for the conditioning call, then dropped — the single-chip fit mode
    # when transformer + T5 exceed the HBM budget together (set
    # automatically by load_flux_pipeline(quantize=...); the reference's
    # scoped-loading pattern, sample/main.rs:217-278, made per-request)
    t5_offload: bool = False

    # (data, model) mesh set by .shard(); None = single device
    mesh: Optional[object] = None

    def shard(self, n_data: Optional[int] = None,
              n_model: Optional[int] = None,
              tensor_parallel: bool = True):
        """Place the Flux pipeline on a (data, model) mesh: transformer
        attention/MLP linears tensor-parallel over the model axis
        (24 heads x 128 — head-aligned for any power-of-two tp), T5
        likewise, the CLIP tower per its head geometry, VAE replicated."""
        from ..parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(n_data, n_model)
        self.mesh = mesh
        self.flux_params = shard_params(
            self.flux_params, mesh, tensor_parallel,
            head_channels=self.flux_cfg.head_dim,
            fixed_heads=self.flux_cfg.n_heads,
        )
        self.t5_params = shard_params(
            self.t5_params, mesh, tensor_parallel,
            head_channels=self.t5_cfg.d_kv,
            fixed_heads=self.t5_cfg.n_heads,
        )
        self.clip_params = shard_params(
            self.clip_params, mesh, tensor_parallel,
            fixed_heads=self.clip_cfg.n_head)
        self.vae_params = shard_params(self.vae_params, mesh, False)
        log(f"flux pipeline sharded over mesh {dict(mesh.shape)}")
        return mesh

    # ------------------------------------------------------------------
    def _encode(self, texts):
        from ..tokenizer.bpe import tokenize_text

        ids = jnp.asarray(np.asarray(
            [tokenize_text(p, self.clip_tokenizer, self.clip_cfg.n_ctx)
             for p in texts], np.int32))
        # pooled WITHOUT text_projection (FluxPipeline's CLIPTextModel
        # pooler_output); project=False also ignores a projection
        # shipped by a random-weight tower
        _, pooled = clip_hidden_pooled(
            self.clip_params, self.clip_cfg, ids,
            self.clip_cfg.n_layer - 1, project=False)
        t5_ids = jnp.asarray(self.t5_tokenize(list(texts)))
        t5_params = self.t5_params
        if self.t5_offload:
            from ..utils.memory import tree_is_on_host, tree_to_device

            if tree_is_on_host(t5_params):
                t5_params = tree_to_device(t5_params)
        ctx = t5_encode(t5_params, self.t5_cfg, t5_ids)
        if self.t5_offload:
            fence(ctx)  # the device copy frees once the encode completes
        return ctx, pooled

    def conditioning(self, prompts, negative_prompt: Optional[str] = None):
        """([B, t5_tokens, 4096] T5 stream, [B, 768] CLIP-L pooled); with
        negative_prompt (true-CFG mode) both are [uncond | cond]."""
        if isinstance(prompts, str):
            prompts = [prompts]
        with self.timer.stage("embedder"):
            ctx, pooled = self._encode(prompts)
            if negative_prompt is not None:
                ctx_u, pool_u = self._encode(
                    [negative_prompt] * len(prompts))
                ctx = jnp.concatenate([ctx_u, ctx], axis=0)
                pooled = jnp.concatenate([pool_u, pooled], axis=0)
            fence(ctx)
        return ctx, pooled

    def _decode(self, latent):
        return sd3_decode_latent(self.vae_params, self.vae_cfg, latent,
                                 self.scale_factor, self.shift_factor)

    def _schedule(self, n_steps, h, w):
        seq_len = (h // 16) * (w // 16)  # packed 2x2 latent tokens
        return flux_schedule(n_steps, seq_len, self.base_shift,
                             self.max_shift, self.dynamic_shifting,
                             self.static_shift)

    def txt2img(
        self,
        prompts,
        resolution: Tuple[int, int] = (1024, 1024),
        n_steps: int = 28,
        guidance_scale: float = 3.5,
        seed: int = 0,
        negative_prompt: str = "",
        true_cfg_scale: float = 1.0,
        device_output: bool = False,
    ) -> np.ndarray:
        h, w = resolution
        if h % 16 or w % 16:
            raise ValueError(f"resolution {h}x{w} must be a multiple of "
                             "16 (2x2-packed 16-ch latent)")
        if isinstance(prompts, str):
            prompts = [prompts]
        # the public pipeline's true_cfg_scale path: real pair-batched CFG
        # over a negative prompt ON TOP of the embedded guidance
        use_tc = bool(negative_prompt) and true_cfg_scale > 1.0
        ctx, pooled = self.conditioning(
            prompts, negative_prompt if use_tc else None)
        shape = (h // 8, w // 8, self.vae_cfg.latent_channels)
        if isinstance(seed, (int, np.integer)):
            lat = jax.random.normal(jax.random.PRNGKey(seed),
                                    (len(prompts),) + shape, jnp.float32)
        else:
            # per-image seeds (the fused-serving contract)
            seeds = list(seed)
            if len(seeds) != len(prompts):
                raise ValueError(f"{len(seeds)} seeds for "
                                 f"{len(prompts)} prompts")
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            lat = jax.vmap(
                lambda k: jax.random.normal(k, shape, jnp.float32))(keys)
        ts, sigmas = self._schedule(n_steps, h, w)
        g = jnp.full((len(prompts),), float(guidance_scale), jnp.float32)
        with self.timer.stage("diffuser"):
            lat = flux_diffuse_latent(
                self.flux_params, self.flux_cfg, lat, ctx, pooled, g,
                jnp.asarray(ts), jnp.asarray(sigmas),
                compute_dtype=self.compute_dtype,
                true_cfg=use_tc, true_cfg_scale=float(true_cfg_scale),
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)

    def kontext(
        self,
        prompts,
        edit_images: np.ndarray,  # [B, H, W, 3] uint8 — image to EDIT
        resolution: Optional[Tuple[int, int]] = None,
        n_steps: int = 28,
        guidance_scale: float = 2.5,
        seed: int = 0,
        negative_prompt: str = "",
        true_cfg_scale: float = 1.0,
        device_output: bool = False,
    ) -> np.ndarray:
        """FLUX.1 Kontext in-context editing (public FluxKontextPipeline
        semantics): the reference image's CLEAN latent tokens join the
        sequence after the denoised target tokens with their RoPE ids
        offset (axis 0 = 1) and stay fixed every step; generation starts
        from pure noise at the target resolution (default: the reference
        image's own size, the pipeline's in-place edit mode); the
        velocity for the reference rows is discarded. Default guidance
        2.5 (the Kontext release default; dev uses 3.5).

        Use a FLUX.1-Kontext-dev checkpoint — the architecture is plain
        Flux, so ordinary dev/schnell weights load too but were not
        trained for the reference stream."""
        if isinstance(prompts, str):
            prompts = [prompts]
        eh, ew = edit_images.shape[1:3]
        if eh % 16 or ew % 16:
            raise ValueError(f"edit image {eh}x{ew} must be a multiple "
                             "of 16 (2x2-packed 16-ch latent)")
        h, w = resolution if resolution is not None else (eh, ew)
        if h % 16 or w % 16:
            raise ValueError(f"resolution {h}x{w} must be a multiple of "
                             "16 (2x2-packed 16-ch latent)")
        use_tc = bool(negative_prompt) and true_cfg_scale > 1.0
        ctx, pooled = self.conditioning(
            prompts, negative_prompt if use_tc else None)
        with self.timer.stage("vae_encode"):
            x = (jnp.asarray(edit_images).astype(jnp.float32) / 255.0
                 * 2.0 - 1.0)
            z = encode_image(self.vae_params, self.vae_cfg, x)
            cond = (z - self.shift_factor) * self.scale_factor
        shape = (h // 8, w // 8, self.vae_cfg.latent_channels)
        if isinstance(seed, (int, np.integer)):
            lat = jax.random.normal(jax.random.PRNGKey(seed),
                                    (len(prompts),) + shape, jnp.float32)
        else:
            seeds = list(seed)
            if len(seeds) != len(prompts):
                raise ValueError(f"{len(seeds)} seeds for "
                                 f"{len(prompts)} prompts")
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            lat = jax.vmap(
                lambda k: jax.random.normal(k, shape, jnp.float32))(keys)
        if cond.shape[0] == 1 and len(prompts) > 1:
            cond = jnp.broadcast_to(cond, (len(prompts),) + cond.shape[1:])
        # mu follows the TARGET token count (FluxKontextPipeline passes
        # image_seq_len = latents.shape[1], the denoised stream)
        ts, sigmas = self._schedule(n_steps, h, w)
        g = jnp.full((len(prompts),), float(guidance_scale), jnp.float32)
        with self.timer.stage("diffuser"):
            lat = flux_diffuse_latent(
                self.flux_params, self.flux_cfg, lat, ctx, pooled, g,
                jnp.asarray(ts), jnp.asarray(sigmas),
                compute_dtype=self.compute_dtype,
                true_cfg=use_tc, true_cfg_scale=float(true_cfg_scale),
                cond_latent=cond,
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
        guidance_scale: float = 3.5,
        seed: int = 0,
        device_output: bool = False,
    ) -> np.ndarray:
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        if isinstance(prompts, str):
            prompts = [prompts]
        ctx, pooled = self.conditioning(prompts)
        with self.timer.stage("vae_encode"):
            x = (jnp.asarray(reference_images).astype(jnp.float32) / 255.0
                 * 2.0 - 1.0)
            z = encode_image(self.vae_params, self.vae_cfg, x)
            lat0 = (z - self.shift_factor) * self.scale_factor
        h, w = reference_images.shape[1:3]
        ts, sigmas = self._schedule(n_steps, h, w)
        start = fm_window(n_steps, strength)
        noise = jax.random.normal(jax.random.PRNGKey(seed), lat0.shape,
                                  jnp.float32)
        lat = fm_add_noise(lat0, noise, float(sigmas[start]))
        g = jnp.full((len(prompts),), float(guidance_scale), jnp.float32)
        with self.timer.stage("diffuser"):
            lat = flux_diffuse_latent(
                self.flux_params, self.flux_cfg, lat, ctx, pooled, g,
                jnp.asarray(ts[start:]), jnp.asarray(sigmas[start:]),
                compute_dtype=self.compute_dtype,
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)

    def inpaint(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        mask_image: Optional[np.ndarray] = None,
        crop_left: Optional[int] = None,
        crop_right: Optional[int] = None,
        crop_top: Optional[int] = None,
        crop_bottom: Optional[int] = None,
        crop_out: bool = False,
        mask_blur: float = 0.0,
        strength: float = 1.0,
        n_steps: int = 28,
        guidance_scale: float = 3.5,
        seed: int = 0,
        device_output: bool = False,
    ) -> np.ndarray:
        """Latent inpainting (diffusers FluxInpaintPipeline blending):
        the un-masked region is re-pinned after every Euler step. Same
        dual mask surface as the SD3/SDXL families (pipeline/masks.py)."""
        from .masks import build_latent_mask

        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        if isinstance(prompts, str):
            prompts = [prompts]
        _, height, width, _ = np.asarray(reference_images).shape
        if height % 16 or width % 16:
            raise ValueError(f"reference image {height}x{width} must be a "
                             "multiple of 16 (2x2-packed 16-ch latent)")
        mask = build_latent_mask(height, width, mask_image, crop_left,
                                 crop_right, crop_top, crop_bottom,
                                 crop_out, mask_blur=mask_blur)
        ctx, pooled = self.conditioning(prompts)
        with self.timer.stage("vae_encode"):
            x = (jnp.asarray(reference_images).astype(jnp.float32) / 255.0
                 * 2.0 - 1.0)
            z = encode_image(self.vae_params, self.vae_cfg, x)
            lat0 = (z - self.shift_factor) * self.scale_factor
        ts, sigmas = self._schedule(n_steps, height, width)
        start = fm_window(n_steps, strength)
        noise = jax.random.normal(jax.random.PRNGKey(seed), lat0.shape,
                                  jnp.float32)
        lat = fm_add_noise(lat0, noise, float(sigmas[start]))
        g = jnp.full((len(prompts),), float(guidance_scale), jnp.float32)
        with self.timer.stage("diffuser"):
            lat = flux_diffuse_latent(
                self.flux_params, self.flux_cfg, lat, ctx, pooled, g,
                jnp.asarray(ts[start:]), jnp.asarray(sigmas[start:]),
                compute_dtype=self.compute_dtype, pin_reference=lat0,
                pin_mask=mask, pin_noise=noise,
            )
        with self.timer.stage("vae_decode"):
            images = self._decode(lat)
            fence(images)
        return images if device_output else np.asarray(images)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------


def random_flux_pipeline(
    seed: int = 0,
    flux_cfg: Optional[FluxConfig] = None,
    clip_cfg: CLIPConfig = CLIPConfig(),
    vae_cfg: Optional[AutoencoderConfig] = None,
    t5_cfg: Optional[T5Config] = None,
    t5_tokens: int = 512,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    quantize: Optional[str] = None,
) -> FluxPipeline:
    """Flux pipeline with random weights (bring-up / tests / bench)."""
    from ..models.clip import init_clip
    from ..models.flux import init_flux
    from ..models.t5 import init_t5
    from ..models.vae import init_autoencoder

    flux_cfg = flux_cfg or FluxConfig()
    vae_cfg = vae_cfg or AutoencoderConfig(n_channels_out=32,
                                           latent_channels=16)
    t5_cfg = t5_cfg or T5Config()
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    flux_params = jax.jit(init_flux, static_argnums=(1, 2))(
        ks[0], flux_cfg, jnp.bfloat16)
    if quantize is not None:
        from ..io.quantize import parse_quantize_spec, quantize_tree

        flux_params = jax.jit(
            lambda t: quantize_tree(t, parse_quantize_spec(quantize))
        )(flux_params)
    clip_params = jax.jit(init_clip, static_argnums=(1, 2))(
        ks[1], clip_cfg, jnp.float32)
    t5_params = jax.jit(init_t5, static_argnums=(1, 2))(ks[2], t5_cfg)
    vae_params = jax.jit(init_autoencoder, static_argnums=(1,))(
        ks[3], vae_cfg)

    def t5_tok(texts):  # test stub: deterministic ids from text hash
        out = np.zeros((len(texts), t5_tokens), np.int32)
        for i, t in enumerate(texts):
            h = abs(hash(t))
            out[i, :8] = [(h >> (4 * j)) % t5_cfg.vocab_size
                          for j in range(8)]
        return out

    return FluxPipeline(
        flux_cfg=flux_cfg, flux_params=flux_params,
        clip_cfg=clip_cfg, clip_params=clip_params,
        t5_cfg=t5_cfg, t5_params=t5_params,
        vae_cfg=vae_cfg, vae_params=vae_params,
        t5_tokenize=t5_tok, t5_tokens=t5_tokens,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        compute_dtype=compute_dtype,
    )


def load_flux_pipeline(
    model_dir: str,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    t5_tokenize=None,
    loras=None,
    quantize: Optional[str] = None,
) -> FluxPipeline:
    """Load a diffusers-layout FLUX.1 directory
    (black-forest-labs/FLUX.1-dev style: transformer/ text_encoder/
    [CLIP-L] text_encoder_2/ [T5] tokenizer_2/ vae/ scheduler/).

    quantize="int8"|"int4" stores the transformer's block linears
    quantized (io/quantize.py) and the T5 encoder at int8 — the
    single-chip deployment mode for the 12B dev/schnell transformers
    (23.8 GB bf16 -> 11.9 / ~6.4 GB). The weights are staged on the
    HOST, quantized there, and only the quantized form ever reaches
    HBM. LoRAs merge BEFORE quantization (full precision)."""
    from ..io.flux import load_flux_diffusers_dir
    from ..io.quantize import parse_quantize_spec, quantize_tree
    from ..utils.memory import tree_to_device

    bits = parse_quantize_spec(quantize)
    log(f"loading Flux diffusers checkpoint from {model_dir}")
    (flux_cfg, flux_params, clip_cfg, clip_params, t5_cfg, t5_params,
     t5_tok, vae_cfg, vae_params, sched) = load_flux_diffusers_dir(
        model_dir, compute_dtype, t5_tokenize=t5_tokenize,
        host=bits is not None)
    if loras:
        from ..io.lora import apply_lora_files

        apply_lora_files(loras, transformer=flux_params, te1=clip_params)
    t5_offload = False
    if bits is not None:
        from ..utils.memory import hbm_budget_bytes, param_bytes

        flux_params = quantize_tree(flux_params, bits)
        t5_params = quantize_tree(t5_params, 8)
        need = (param_bytes(flux_params) + param_bytes(t5_params)
                + param_bytes(vae_params) + param_bytes(clip_params))
        budget = hbm_budget_bytes()
        flux_params = tree_to_device(flux_params)
        if need > budget:
            # transformer + T5 don't fit together: park T5 on the host
            # and ship it per conditioning call (scoped loading,
            # reference sample/main.rs:217-278 — made per-request)
            t5_offload = True
            log(f"quantized towers need {need / 2**30:.1f} GiB > budget "
                f"{budget / 2**30:.1f} GiB: T5 stays host-parked and is "
                "shipped per conditioning call (t5_offload)")
        else:
            t5_params = tree_to_device(t5_params)
    return FluxPipeline(
        flux_cfg=flux_cfg, flux_params=flux_params,
        clip_cfg=clip_cfg, clip_params=clip_params,
        t5_cfg=t5_cfg, t5_params=t5_params,
        vae_cfg=vae_cfg, vae_params=vae_params,
        t5_tokenize=t5_tok,
        t5_tokens=256 if not flux_cfg.guidance_embeds else 512,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        base_shift=sched.get("base_shift", FLUX_BASE_SHIFT),
        max_shift=sched.get("max_shift", FLUX_MAX_SHIFT),
        dynamic_shifting=sched.get("use_dynamic_shifting", True),
        static_shift=sched.get("shift", 1.0),
        compute_dtype=compute_dtype,
        t5_offload=t5_offload,
    )
