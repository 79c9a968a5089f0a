"""High-level SDXL pipeline: prompt -> PNG-ready uint8 images.

Orchestrates the stages exactly as the reference `sample` binary does
(/root/reference/src/bin/sample/main.rs:130-291):

  embedder (f32) -> conditioning (cast to UNet dtype) -> base UNet DDIM
  loop (bf16) -> optional refiner (re-noise @ t=800) -> VAE decode (f32)
  -> uint8 RGB

plus the latent-space crop-window inpainting path (main.rs:135-197).

Unlike the reference there is no host round-trip between stages and every
stage is one jitted program; precision staging is a device-side cast.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    AutoencoderConfig,
    DiffuserConfig,
    EmbedderConfig,
    SDXL_BASE_DIFFUSER,
    SDXL_EMBEDDER,
)
from ..tokenizer import ClipTokenizer, OpenClipTokenizer
from ..utils import StageTimer, fence, log
from .conditioning import Conditioning, text_to_conditioning
from .latent import decode_latent_to_images, encode_images_to_latent
from .resolutions import RESOLUTIONS, validate_resolution
from .sampler import (
    K_SAMPLERS,
    K_STOCHASTIC,
    euler_sample_latent,
    k_refine_latent,
    refine_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)

SAMPLERS = ("ddim",) + K_SAMPLERS + ("lcm",)


@dataclass
class SDXLPipeline:
    embedder_cfg: EmbedderConfig
    embedder_params: dict
    diffuser_cfg: DiffuserConfig
    unet_params: dict
    alphas_cumprod: jnp.ndarray
    vae_cfg: AutoencoderConfig
    vae_params: dict
    scale_factor: float = 0.13025
    refiner_cfg: Optional[DiffuserConfig] = None
    refiner_params: Optional[dict] = None
    refiner_alphas: Optional[jnp.ndarray] = None
    clip_tokenizer: ClipTokenizer = None
    open_clip_tokenizer: OpenClipTokenizer = None
    compute_dtype: jnp.dtype = jnp.bfloat16
    # VAE decode memory bound: decode at most this many images per call
    # (decoder activations peak at ~0.5 GB/image f32 at 1024px)
    vae_decode_chunk: int = 2
    # opt-in half-precision decode (see decode_latent_to_images); the
    # reference decodes f32 and so do we by default
    vae_dtype: jnp.dtype = jnp.float32
    # SDXL enforces its trained aspect buckets on inpainting inputs
    # (sample/main.rs:138-144); SD 1.x/2.x pipelines only warn
    strict_resolutions: bool = True
    # extra CLIP transformer blocks to skip beyond the family default
    # (SDXL default is already the penultimate hidden) — the ecosystem's
    # "clip skip" knob for anime/fine-tuned checkpoints
    clip_skip: int = 0
    # (data, model) device mesh set by .shard(); None = single device
    mesh: Optional[object] = None
    # latent->RGB preview factors (None = SDXL's; SD1Pipeline overrides)
    preview_factors: Optional[object] = None
    # optional ControlNet (models/controlnet.py): trunk params + its
    # UNetConfig, set by load_controlnet(); used when txt2img is called
    # with a control_image
    controlnet_params: Optional[dict] = None
    controlnet_cfg: Optional[object] = None
    # optional IP-Adapter (models/ip_adapter.py): projection + per-layer
    # to_k_ip/to_v_ip weights, plus its CLIP vision encoder, set by
    # load_ip_adapter(); used when txt2img is called with ip_adapter_image
    ip_adapter_params: Optional[dict] = None
    ip_adapter_cfg: Optional[object] = None
    ip_vision_params: Optional[dict] = None
    ip_vision_cfg: Optional[object] = None
    # tiled VAE decode: latent tile size (None = whole-image decode); for
    # resolutions whose full decode exceeds HBM (>= 4096^2 px)
    vae_tile: Optional[int] = None
    timer: StageTimer = field(default_factory=StageTimer)
    # memo for the unconditional conditioning half: for a given negative
    # prompt it depends only on (resolution, crop, clip_skip), not on the
    # request's prompts — cached across requests, cleared whenever the
    # embedder params change (textual inversions, LoRA)
    _uncond_cache: dict = field(default_factory=dict)

    def shard(self, n_data: Optional[int] = None,
              n_model: Optional[int] = None,
              tensor_parallel: bool = True):
        """Place the pipeline on a (data, model) device mesh
        (parallel/mesh.py): transformer linears tensor-parallel over the
        model axis, batch over the data axis, convs/VAE replicated. XLA
        GSPMD inserts all ICI collectives; subsequent generation calls
        shard their conditioning automatically. Returns the mesh."""
        from ..parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(n_data, n_model)
        self.mesh = mesh
        # head-aligned TP (parallel/mesh.py): pass each model's head
        # geometry so attention shards only where heads % tp == 0
        self.unet_params = shard_params(
            self.unet_params, mesh, tensor_parallel,
            head_channels=self.diffuser_cfg.num_head_channels,
            fixed_heads=getattr(self.diffuser_cfg, "n_heads", 0),
        )
        if self.refiner_params is not None:
            self.refiner_params = shard_params(
                self.refiner_params, mesh, tensor_parallel,
                head_channels=self.refiner_cfg.num_head_channels,
                fixed_heads=getattr(self.refiner_cfg, "n_heads", 0),
            )
        if self.embedder_params is not None:
            tower_cfgs = {
                "clip": self.embedder_cfg.clip_config,
                "open_clip": self.embedder_cfg.open_clip_config,
            }
            if set(self.embedder_params) <= set(tower_cfgs):
                self.embedder_params = {
                    k: shard_params(v, mesh, tensor_parallel,
                                    fixed_heads=tower_cfgs[k].n_head)
                    for k, v in self.embedder_params.items()
                }
            else:
                self.embedder_params = shard_params(
                    self.embedder_params, mesh, tensor_parallel
                )
        self.vae_params = shard_params(self.vae_params, mesh, False)
        if self.controlnet_params is not None:
            # the control trunk copies the UNet's geometry; same TP rules
            # (multi-ControlNet: shard each net's trunk independently so
            # the name-based sharding rules see the same key paths)
            def _shard_cn(p):
                return shard_params(
                    p, mesh, tensor_parallel,
                    head_channels=self.diffuser_cfg.num_head_channels,
                    fixed_heads=getattr(self.diffuser_cfg, "n_heads", 0),
                )

            if isinstance(self.controlnet_params, tuple):
                self.controlnet_params = tuple(
                    _shard_cn(p) for p in self.controlnet_params
                )
            else:
                self.controlnet_params = _shard_cn(self.controlnet_params)
        self._uncond_cache.clear()  # cached tensors carry pre-shard layout
        log(f"pipeline sharded over mesh {dict(mesh.shape)}")
        return mesh

    # AYS schedule family variant (arXiv:2404.14507): the published
    # 10-point tables differ per family; SD1Pipeline overrides
    _ays_variant = "ays"

    def _resolve_schedule(self, schedule: str) -> str:
        return self._ays_variant if schedule == "ays" else schedule

    def rescale_zsnr(self):
        """Rescale the ᾱ table(s) to zero terminal SNR in place
        (sampler.rescale_zero_terminal_snr) — for checkpoints finetuned
        with the Lin et al. 2023 fix (v-prediction ZSNR models). Pair
        with schedule="trailing" and guidance_rescale > 0 as their model
        cards prescribe. Returns self for chaining."""
        from .sampler import rescale_zero_terminal_snr

        self.alphas_cumprod = jnp.asarray(
            rescale_zero_terminal_snr(np.asarray(self.alphas_cumprod)))
        if getattr(self, "refiner_alphas", None) is not None:
            # The SDXL refiner is NOT a ZSNR finetune (ZSNR checkpoints
            # don't ship refiners); rescaling its table would miscondition
            # the refiner tail with a ~4096 terminal sigma. Leave it
            # untouched and tell the user the combination is suspect.
            log("warning: --zsnr leaves the refiner's alpha-bar table "
                "unrescaled (the refiner is not a ZSNR finetune); "
                "combining --zsnr with a refiner is not a published recipe")
        self._uncond_cache.clear()
        return self

    def _shard_cond(self, cond):
        if self.mesh is None:
            return cond
        from ..parallel.mesh import shard_batch

        return shard_batch(cond, self.mesh)

    def _decode(self, latent):
        """Chunked VAE decode: identical output, bounded peak memory.
        vae_tile additionally tiles SPATIALLY (decode_latent_tiled) for
        resolutions whose full decode exceeds HBM."""
        if self.vae_tile is not None:
            from .latent import decode_latent_tiled

            return jnp.concatenate([
                decode_latent_tiled(
                    self.vae_params, self.vae_cfg, latent[i : i + 1],
                    self.scale_factor, self.vae_dtype, tile=self.vae_tile,
                )
                for i in range(latent.shape[0])
            ], axis=0)
        n = latent.shape[0]
        c = self.vae_decode_chunk
        if c <= 0 or n <= c:
            return decode_latent_to_images(
                self.vae_params, self.vae_cfg, latent, self.scale_factor,
                self.vae_dtype,
            )
        parts = [
            decode_latent_to_images(
                self.vae_params, self.vae_cfg, latent[i : i + c],
                self.scale_factor, self.vae_dtype,
            )
            for i in range(0, n, c)
        ]
        return jnp.concatenate(parts, axis=0)

    def _encode(self, images, scale_factor=None):
        """VAE encode honoring --vae-tile (encode_images_tiled), the
        encoder-side twin of _decode's spatial tiling — bounds encoder
        memory for >=4096^2 img2img / inpaint / inversion inputs."""
        sf = self.scale_factor if scale_factor is None else scale_factor
        imgs = jnp.asarray(images)
        if self.vae_tile is not None:
            from .latent import encode_images_tiled

            return encode_images_tiled(self.vae_params, self.vae_cfg, imgs,
                                       sf, tile=self.vae_tile)
        return encode_images_to_latent(self.vae_params, self.vae_cfg, imgs,
                                       sf)

    # -- conditioning --------------------------------------------------------

    def conditioning(
        self,
        prompts,
        resolution: Tuple[int, int],
        crop: Tuple[int, int] = (0, 0),
        negative_prompt: str = "",
        profile_stages: bool = True,
    ) -> Conditioning:
        with self.timer.stage("embedder"):
            cond = text_to_conditioning(
                self.embedder_params,
                self.embedder_cfg,
                self.clip_tokenizer,
                self.open_clip_tokenizer,
                prompts,
                resolution,
                crop,
                negative_prompt,
                clip_skip=self.clip_skip,
                uncond_cache=self._uncond_cache,
            )
            if profile_stages:
                fence(cond.context_full)
        return cond

    def add_textual_inversions(self, specs) -> None:
        """Merge textual-inversion embedding files ('PATH[:word]', in order)
        into both tokenizers and both CLIP embedding tables
        (io/textual_inversion.py)."""
        from ..io.textual_inversion import apply_textual_inversions

        self.embedder_params = apply_textual_inversions(
            list(specs),
            tokenizers=[self.clip_tokenizer, self.open_clip_tokenizer],
            embedder_params=self.embedder_params,
            tower_keys=["clip", "open_clip"],
            tower_widths=[
                self.embedder_cfg.clip_config.n_state,
                self.embedder_cfg.open_clip_config.n_state,
            ],
        )
        self._uncond_cache.clear()  # embedding tables changed

    def load_controlnet(self, model_dir) -> None:
        """Load diffusers-layout ControlNetModel directories for this
        pipeline's UNet family (io/diffusers_sdxl.py). Subsequent txt2img
        calls with a control_image run the trunk(s) every step and inject
        the (summed) residuals.

        model_dir: one path, or a sequence of paths for multi-ControlNet
        (diffusers MultiControlNetModel semantics — all nets must share
        the UNet family, residuals are summed with per-net scales)."""
        from ..io.diffusers_sdxl import load_controlnet_dir

        dirs = ([model_dir] if isinstance(model_dir, (str, os.PathLike))
                else list(model_dir))
        loaded = [
            load_controlnet_dir(d, self.diffuser_cfg, self.compute_dtype)
            for d in dirs
        ]
        cfgs = {cfg for _, cfg in loaded}
        if len(cfgs) > 1:
            raise ValueError(
                "multi-ControlNet requires all nets to share one trunk "
                f"config; got {len(cfgs)} distinct configs from {dirs}"
            )
        self.controlnet_cfg = loaded[0][1]
        if len(loaded) == 1:
            self.controlnet_params = loaded[0][0]
        else:
            self.controlnet_params = tuple(p for p, _ in loaded)
        log(f"controlnet loaded from {', '.join(map(str, dirs))}"
            + (f" ({len(loaded)} nets)" if len(loaded) > 1 else ""))

    def load_ip_adapter(self, adapter_path: str,
                        image_encoder_dir: str) -> None:
        """Load an official IP-Adapter safetensors file plus its
        transformers CLIPVisionModelWithProjection directory
        (io/ip_adapter.py). Subsequent txt2img/img2img calls with an
        ip_adapter_image add decoupled image-token cross-attention to the
        base UNet (the refiner stage, if any, runs unguided)."""
        from ..io.ip_adapter import load_clip_vision_dir, load_ip_adapter_file

        self.ip_vision_params, self.ip_vision_cfg = load_clip_vision_dir(
            image_encoder_dir, jnp.float32
        )
        self.ip_adapter_params, self.ip_adapter_cfg = load_ip_adapter_file(
            adapter_path, self.diffuser_cfg.unet_config(), jnp.float32
        )
        # "proj" consumes the projected image embedding; "resampler"
        # (plus) consumes the penultimate hidden states
        enc_dim = (self.ip_vision_cfg.n_state
                   if self.ip_adapter_cfg.variant == "resampler"
                   else self.ip_vision_cfg.embed_dim)
        if self.ip_adapter_cfg.clip_embed_dim != enc_dim:
            raise ValueError(
                f"IP-Adapter expects {self.ip_adapter_cfg.clip_embed_dim}-d "
                f"image features but the encoder provides {enc_dim} — "
                "wrong image encoder? (ip-adapter_sdxl pairs with "
                "ViT-bigG, *_vit-h adapters with ViT-H)"
            )
        log(f"ip-adapter loaded from {adapter_path} "
            f"(encoder {image_encoder_dir}, "
            f"{self.ip_adapter_cfg.variant} variant, "
            f"{self.ip_adapter_cfg.n_tokens} image tokens)")

    def _prep_ip(self, image, scale: float) -> Optional[dict]:
        """ip_adapter_image -> the sampler `ip` dict: CLIP-embed the
        image once (loop-invariant), project to image tokens, pair with
        the zero-image unconditional tokens (official get_image_embeds
        semantics)."""
        if image is None:
            return None
        if self.ip_adapter_params is None:
            raise ValueError(
                "ip_adapter_image given but no IP-Adapter is loaded "
                "(pipe.load_ip_adapter / --ip-adapter)"
            )
        from ..models.clip_vision import (
            clip_vision_embed_jit,
            clip_vision_penultimate_jit,
            preprocess_image,
        )
        from ..models.ip_adapter import ip_image_tokens, resampler_tokens

        pixels = preprocess_image(np.asarray(image), self.ip_vision_cfg)
        proj = self.ip_adapter_params["image_proj"]
        if self.ip_adapter_cfg.variant == "resampler":
            # plus adapters: penultimate hidden states; the uncond branch
            # runs the tower on ZERO pixels (official IPAdapterPlus
            # get_image_embeds)
            hidden = clip_vision_penultimate_jit(
                self.ip_vision_params, self.ip_vision_cfg, pixels)
            uhidden = clip_vision_penultimate_jit(
                self.ip_vision_params, self.ip_vision_cfg,
                jnp.zeros_like(pixels))
            tokens = resampler_tokens(proj, self.ip_adapter_cfg, hidden)
            utokens = resampler_tokens(proj, self.ip_adapter_cfg, uhidden)
        else:
            embed = clip_vision_embed_jit(self.ip_vision_params,
                                          self.ip_vision_cfg, pixels)
            tokens = ip_image_tokens(proj, self.ip_adapter_cfg, embed)
            utokens = ip_image_tokens(proj, self.ip_adapter_cfg,
                                      jnp.zeros_like(embed))
        return {
            "layers": self.ip_adapter_params["layers"],
            "tokens": tokens,
            "tokens_uncond": utokens,
            "scale": jnp.float32(scale),
        }

    @property
    def n_controlnets(self) -> int:
        if self.controlnet_params is None:
            return 0
        if isinstance(self.controlnet_params, tuple):
            return len(self.controlnet_params)
        return 1

    def _prep_one_control(self, control_image, resolution, batch):
        """Validate + normalize a control image to [B, H, W, 3] float in
        [0, 1] (the diffusers control-image convention)."""
        img = np.asarray(control_image)
        if img.ndim == 3:
            img = img[None]
        h, w = resolution
        if img.shape[1:3] != (h, w):
            raise ValueError(
                f"control image is {img.shape[1]}x{img.shape[2]}, generation "
                f"resolution is {h}x{w} — they must match"
            )
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = jnp.asarray(img, jnp.float32)
        return jnp.broadcast_to(img, (batch, h, w, 3))

    def _control_kwargs(self, control_image, control_scale, control_start,
                        control_end, resolution, batch) -> dict:
        """Sampler control_* kwargs for single or multi ControlNet.

        control_image: one [H,W,3]/[B,H,W,3] array, or a sequence of N
        arrays (one per loaded net). control_scale/start/end: one float
        each, broadcast to all nets, or sequences of N floats."""
        if control_image is None:
            return {}
        n = self.n_controlnets
        if n == 0:
            raise ValueError(
                "control_image given but no ControlNet is loaded "
                "(pipe.load_controlnet / --controlnet)"
            )
        multi_img = (isinstance(control_image, (list, tuple))
                     or (isinstance(control_image, np.ndarray)
                         and control_image.ndim == 5))

        def per_net(v, name):
            if isinstance(v, (list, tuple)):
                if len(v) != n:
                    raise ValueError(
                        f"{name}: {len(v)} values for {n} ControlNets"
                    )
                return tuple(float(x) for x in v)
            return tuple(float(v) for _ in range(n))

        if n == 1 and not multi_img:
            return dict(
                control_params=self.controlnet_params,
                control_image=self._prep_one_control(
                    control_image, resolution, batch),
                control_scale=float(control_scale)
                if not isinstance(control_scale, (list, tuple))
                else float(control_scale[0]),
                control_cfg=self.controlnet_cfg,
                control_window=(
                    float(control_start) if not isinstance(
                        control_start, (list, tuple))
                    else float(control_start[0]),
                    float(control_end) if not isinstance(
                        control_end, (list, tuple))
                    else float(control_end[0]),
                ),
            )
        imgs = (list(control_image) if multi_img else [control_image] * n)
        if len(imgs) != n:
            raise ValueError(f"{len(imgs)} control images for {n} ControlNets")
        params = (self.controlnet_params if isinstance(
            self.controlnet_params, tuple) else (self.controlnet_params,))
        scales = per_net(control_scale, "control_scale")
        starts = per_net(control_start, "control_start")
        ends = per_net(control_end, "control_end")
        return dict(
            control_params=params,
            control_image=tuple(
                self._prep_one_control(im, resolution, batch) for im in imgs
            ),
            control_scale=scales,
            control_cfg=self.controlnet_cfg,
            control_window=tuple(zip(starts, ends)),
        )

    # -- generation ----------------------------------------------------------

    def txt2img(
        self,
        prompts,
        resolution: Tuple[int, int] = (1024, 1024),
        n_steps: int = 30,
        guidance_scale: float = 7.5,
        seed: int = 0,
        use_refiner: bool = False,
        refiner_step_start: int = 800,
        denoising_end: Optional[float] = None,
        negative_prompt: str = "",
        inpaint_reference: Optional[np.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        device_output: bool = False,
        profile_stages: bool = True,
        sampler: str = "ddim",
        schedule: str = "linear",
        guidance_rescale: float = 0.0,
        no_cfg: bool = False,
        preview_every: Optional[int] = None,
        preview_callback=None,
        control_image: Optional[np.ndarray] = None,
        control_scale: float = 1.0,
        control_start: float = 0.0,
        control_end: float = 1.0,
        ip_adapter_image: Optional[np.ndarray] = None,
        ip_adapter_scale: float = 0.6,
        deepcache: Optional[Tuple[int, int]] = None,
        pag_scale: float = 0.0,
        initial_latent: Optional[jnp.ndarray] = None,
        ddim_eta: float = 0.0,
    ) -> np.ndarray:
        """Full pipeline; returns [B, H, W, 3] uint8.

        ddim_eta > 0 (sampler="ddim" only): stochastic DDIM — diffusers
        DDIMScheduler's eta (eta=1 ~ DDPM ancestral); per-image seeds
        keep their own step-noise streams like the stochastic
        k-samplers. eta=0 is the reference's deterministic path bitwise.

        initial_latent ([B,h,w,4] VP-space latent at the schedule's first
        timestep, e.g. from ddim_invert): starts the DDIM chain from a
        given noisy latent instead of fresh noise — the
        inversion-editing workflow (invert with the source prompt, then
        txt2img with an edit prompt over the same latent). sampler="ddim"
        only (the inversion is defined on the DDIM chain); not
        combinable with per-image seed lists, inpainting, previews, or
        the refiner.

        pag_scale > 0: Perturbed-Attention Guidance (arXiv:2403.17377;
        "mid" layers) — one extra conditional UNet eval per step; not
        combinable with ControlNet, DeepCache, step previews, or the LCM
        sampler.

        deepcache ((interval, branch), e.g. (2, 3)): DeepCache
        (arXiv:2312.00858) — every interval-th step runs the full UNet
        and caches the deep decoder feature; other steps recompute only
        the `branch` shallowest blocks. ~interval× less deep-transformer
        work for a small quality cost; incompatible with ControlNet,
        9-channel inpainting UNets, and step previews.

        ip_adapter_image ([H, W, 3] or [B, H, W, 3] uint8/float, any
        size — CLIP-resized internally): image-prompt conditioning via
        the loaded IP-Adapter (load_ip_adapter) at ip_adapter_scale;
        applies to the base UNet on every sampler path (the refiner
        stage runs unguided).

        control_image ([H, W, 3] or [B, H, W, 3] uint8/float, same size as
        `resolution`) runs the loaded ControlNet (load_controlnet) every
        step and injects its residuals scaled by control_scale;
        control_start/control_end bound the step-fraction window the
        residuals apply in (diffusers' control_guidance_start/end).

        denoising_end (with use_refiner=True): ensemble-of-experts split
        (diffusers' StableDiffusionXLPipeline denoising_end + the img2img
        refiner's denoising_start) — the base runs only the schedule
        entries with t >= round(n_train*(1-denoising_end)) and hands the
        STILL-NOISY latent to the refiner, which continues the
        complementary suffix with NO re-noise. This is the documented
        SDXL two-expert recipe (e.g. 0.8); the default (None) keeps the
        reference's re-noise-at-refiner_step_start mode (mod.rs:355-376).
        Not combinable with inpainting, step previews, or the LCM
        sampler.

        seed: one int (reference semantics: the whole batch's noise from
        one key) or a per-image sequence — each image's initial AND
        refiner re-noise depend only on its own seed, so batched serving
        can fuse requests without changing their results. Exception: DDIM
        inpainting's per-STEP pin noise is drawn from one key over the
        batch (as the reference does, mod.rs:434-483), so batched inpaint
        results depend on batch composition — the server never fuses
        inpaint requests, so the serving contract is unaffected.

        preview_every=N (all samplers): between every N steps,
        preview_callback(done, total, rgb_u8) receives a cheap linear-map
        preview of the current latent (sampler.latent_to_preview). The
        final image matches the unsegmented run (DDIM: bit-identical;
        euler/dpmpp: segmented scan with the multistep history carried
        across boundaries).

        schedule="karras" applies the Karras rho=7 sigma spacing to the
        euler/dpmpp samplers (invalid with ddim, whose schedule is fixed
        by reference semantics); schedule="trailing"/"leading" pick
        diffusers' other timestep_spacing grids — trailing anchors the
        first step at the terminal t=n_train-1 with uniform n_train/n
        spacing (leading never samples the terminal timestep) and is
        required by SDXL-Lightning / zero-terminal-SNR checkpoints.

        guidance_rescale>0 applies the Lin et al. 2023 std-matching CFG
        correction. no_cfg=True drops the unconditional branch (half the
        UNet work — for guidance-distilled Turbo/Lightning-style models);
        guidance_scale == 1 takes the same fast path automatically because
        u + (c-u)*1 == c exactly.

        device_output=True returns the fenced on-device uint8 array without
        the host copy (benchmarking; over the axon tunnel the host link is
        ~10 MB/s and would dominate the measurement, unlike real PCIe).
        """
        h, w = resolution
        if h % 8 or w % 8:
            raise ValueError(f"resolution {h}x{w} must be a multiple of 8")
        if not validate_resolution(h, w):
            # SDXL was trained on the RESOLUTIONS buckets; off-bucket sizes
            # run fine but degrade quality (mod.rs:583-624)
            log(f"warning: {h}x{w} is not an SDXL-trained resolution bucket")

        from .prompt_schedule import parse_batch_schedule

        plist = [prompts] if isinstance(prompts, str) else list(prompts)
        sched = parse_batch_schedule(plist, n_steps)
        if sched is not None:
            blocked = [
                ("use_refiner", use_refiner),
                ("inpainting", inpaint_reference is not None),
                ("denoising_end", denoising_end is not None),
                ("step previews", preview_every is not None),
                ("ControlNet", control_image is not None),
                ("IP-Adapter", ip_adapter_image is not None),
                ("deepcache", deepcache is not None),
                ("pag_scale", bool(pag_scale)),
                ("the LCM sampler", sampler == "lcm"),
                ("initial_latent", initial_latent is not None),
            ]
            bad = [n for n, hit in blocked if hit]
            if bad:
                raise ValueError(
                    "prompt editing ([from:to:when] / [a|b]) is not "
                    f"combinable with {', '.join(bad)}")
            return self._txt2img_scheduled(
                sched, resolution, n_steps, guidance_scale, seed,
                negative_prompt, sampler, schedule, guidance_rescale,
                no_cfg, device_output, profile_stages, ddim_eta=ddim_eta)

        cond = self.conditioning(
            prompts, resolution, negative_prompt=negative_prompt,
            profile_stages=profile_stages,
        )
        cond_half = self._shard_cond(cond.astype(self.compute_dtype))

        if initial_latent is not None:
            if sampler != "ddim":
                raise ValueError(
                    "initial_latent starts the DDIM chain (ddim_invert's "
                    "output is defined on it) — use sampler='ddim'")
            if (inpaint_reference is not None or use_refiner
                    or preview_every is not None
                    or not isinstance(seed, (int, np.integer))):
                raise ValueError(
                    "initial_latent is not combinable with inpainting, "
                    "the refiner, previews, or per-image seed lists")
            lh, lw = h // 8, w // 8
            if tuple(initial_latent.shape[1:]) != (lh, lw, 4):
                raise ValueError(
                    f"initial_latent shape {tuple(initial_latent.shape)} "
                    f"does not match resolution {h}x{w} "
                    f"(expect [B, {lh}, {lw}, 4])")

        seeds = None
        if not isinstance(seed, (int, np.integer)):
            seeds = list(seed)
            if len(seeds) != cond.context_full.shape[0]:
                raise ValueError(
                    f"{len(seeds)} seeds for a {cond.context_full.shape[0]}"
                    "-image batch"
                )
            seed = seeds[0]
        key = jax.random.PRNGKey(seed)
        base_key, refiner_key = jax.random.split(key)
        initial_noise = (None if initial_latent is None
                         else jnp.asarray(initial_latent, jnp.float32))
        step_keys = None
        if seeds is not None:
            from .sampler import gen_noise_per_seed

            initial_noise = gen_noise_per_seed(seeds, cond_half)
            if (sampler in K_STOCHASTIC or sampler == "lcm"
                    or (sampler == "ddim" and ddim_eta > 0)):
                # stochastic samplers (euler_a/dpmpp_sde/lcm/ddim-eta)
                # draw noise every step: per-image scan keys keep image
                # i's full noise stream a function of seeds[i] alone
                # (fused serving contract)
                from .sampler import ddim_timesteps, k_step_keys_per_seed

                n_keys = n_steps
                if sampler == "ddim":
                    # the DDIM grid can exceed n_steps (the 31-iteration
                    # quirk, mod.rs:400-406) — keys must cover it
                    n_keys = len(ddim_timesteps(
                        0, n_steps, int(self.alphas_cumprod.shape[0])))
                step_keys = k_step_keys_per_seed(seeds, n_keys)

        reference_latent = None
        concat_channels = None
        if inpaint_reference is not None and self.diffuser_cfg.in_channels == 9:
            # inpainting-specialized UNet (diffusers *-inpainting layout):
            # instead of pinning re-noised reference latents each step, the
            # model conditions on [mask, masked-image latent] input channels
            with self.timer.stage("vae_encode"):
                m = inpaint_mask[..., :1].astype(jnp.float32)  # 1 = generate
                px = jnp.repeat(jnp.repeat(m, 8, axis=1), 8, axis=2)
                ref = jnp.asarray(inpaint_reference).astype(jnp.float32)
                # masked pixels -> mid-gray (0 in the VAE's [-1, 1] input)
                masked_px = ref * (1.0 - px) + 127.5 * px
                masked_latent = self._encode(
                    masked_px.astype(jnp.uint8))
                b = cond.context_full.shape[0]
                lh, lw = m.shape[1], m.shape[2]
                concat_channels = jnp.concatenate(
                    [
                        jnp.broadcast_to(m, (b, lh, lw, 1)),
                        jnp.broadcast_to(masked_latent, (b, lh, lw, 4)),
                    ],
                    axis=-1,
                )
                if profile_stages:
                    fence(concat_channels)
            inpaint_mask = None  # the pin path is for 4-channel models
        elif inpaint_reference is not None:
            with self.timer.stage("vae_encode"):
                reference_latent = self._encode(inpaint_reference)
                if profile_stages:
                    fence(reference_latent)

        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} ({'|'.join(SAMPLERS)})")
        if ddim_eta and sampler != "ddim":
            raise ValueError("ddim_eta applies to sampler='ddim' only (the "
                             "k-samplers have their own ancestral variants)")
        if schedule != "linear" and sampler in ("ddim", "lcm"):
            raise ValueError(
                "--schedule applies to the euler/dpmpp samplers; the DDIM "
                "and LCM schedules are fixed by their reference semantics"
            )
        schedule = self._resolve_schedule(schedule)
        use_cfg = not (no_cfg or guidance_scale == 1.0)
        if sampler == "lcm" and self.diffuser_cfg.time_cond_proj_dim:
            # LCM-distilled UNet: guidance enters via the cond_proj
            # embedding; true CFG would double the work for nothing
            use_cfg = False
        ctl = self._control_kwargs(control_image, control_scale,
                                   control_start, control_end, resolution,
                                   cond.context_full.shape[0])
        ipd = self._prep_ip(ip_adapter_image, ip_adapter_scale)
        if deepcache is not None and preview_every is not None:
            raise ValueError(
                "deepcache is incompatible with step previews (the "
                "segmented scans do not carry the feature cache)"
            )
        if preview_every is not None and sampler == "lcm":
            raise ValueError(
                "step previews are not supported with the LCM sampler "
                "(4-8 steps total; preview the final image instead)"
            )
        if pag_scale:
            if preview_every is not None:
                raise ValueError("pag_scale is not supported with step "
                                 "previews")
            if sampler == "lcm":
                raise ValueError("pag_scale does not apply to the LCM "
                                 "sampler (consistency models embed their "
                                 "own guidance)")

        head_steps = 0
        grid_total = 0
        if denoising_end is not None:
            if not use_refiner:
                raise ValueError(
                    "denoising_end is the ensemble-of-experts base/refiner "
                    "split — it requires use_refiner=True")
            if preview_every is not None or sampler == "lcm":
                raise ValueError("denoising_end is not combinable with step "
                                 "previews or the LCM sampler")
            if inpaint_reference is not None:
                raise ValueError("denoising_end is not combinable with "
                                 "inpainting (the refiner tail has no pin "
                                 "path)")
            from .sampler import expert_head_steps

            head_steps, grid_total = expert_head_steps(
                self.alphas_cumprod, n_steps, denoising_end, sampler,
                schedule)
            log(f"expert split: base {head_steps} steps, refiner "
                f"{grid_total - head_steps} steps (denoising_end="
                f"{denoising_end})")

        with self.timer.stage("diffuser"):
            if preview_every is not None and sampler in K_SAMPLERS:
                from .sampler import (
                    gen_noise,
                    k_diffuse_latent_preview,
                    k_sigma_max,
                )

                # same key split + sigma-space scaling as euler_sample_latent
                noise_key, inpaint_key = jax.random.split(base_key)
                sigma_max = k_sigma_max(self.alphas_cumprod, n_steps,
                                        schedule)
                k_lat0 = (initial_noise if initial_noise is not None
                          else gen_noise(noise_key, cond_half)) * sigma_max
                latent = k_diffuse_latent_preview(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    k_lat0, cond_half, guidance_scale, preview_every,
                    preview_callback, method=sampler, step_start=0,
                    n_steps=n_steps, compute_dtype=self.compute_dtype,
                    inpaint=reference_latent is not None
                    and inpaint_mask is not None,
                    reference=reference_latent, mask=inpaint_mask,
                    key=inpaint_key, schedule=schedule, use_cfg=use_cfg,
                    guidance_rescale=guidance_rescale,
                    concat_channels=concat_channels,
                    preview_factors=self.preview_factors,
                    step_keys=step_keys, ip=ipd, **ctl,
                )
            elif preview_every is not None:
                from .sampler import diffuse_latent_preview, gen_noise

                # same key split as sample_latent: bit-identical noise
                noise_key, inpaint_key = jax.random.split(base_key)
                latent = diffuse_latent_preview(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    initial_noise if initial_noise is not None
                    else gen_noise(noise_key, cond_half), cond_half,
                    guidance_scale, preview_every, preview_callback,
                    0, n_steps, self.compute_dtype,
                    inpaint=reference_latent is not None
                    and inpaint_mask is not None,
                    reference=reference_latent, mask=inpaint_mask,
                    key=inpaint_key, use_cfg=use_cfg,
                    guidance_rescale=guidance_rescale,
                    concat_channels=concat_channels,
                    preview_factors=self.preview_factors, ip=ipd,
                    ddim_eta=ddim_eta, step_keys=step_keys, **ctl,
                )
            elif sampler == "lcm":
                from .sampler import lcm_sample_latent

                if deepcache is not None:
                    raise ValueError("deepcache is not supported with the "
                                     "LCM sampler (few-step by design)")
                latent = lcm_sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond_half, base_key, guidance_scale, n_steps,
                    compute_dtype=self.compute_dtype,
                    reference=reference_latent, mask=inpaint_mask,
                    use_cfg=use_cfg, concat_channels=concat_channels,
                    initial_noise=initial_noise, step_keys=step_keys,
                    ip=ipd, **ctl,
                )
            elif sampler in K_SAMPLERS:
                latent = euler_sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond_half, base_key, guidance_scale, n_steps,
                    self.compute_dtype, method=sampler,
                    reference=reference_latent, mask=inpaint_mask,
                    schedule=schedule, use_cfg=use_cfg,
                    guidance_rescale=guidance_rescale,
                    concat_channels=concat_channels,
                    initial_noise=initial_noise, step_keys=step_keys,
                    ip=ipd, deepcache=deepcache, pag_scale=pag_scale,
                    head_steps=head_steps, **ctl,
                )
            else:
                latent = sample_latent(
                    self.unet_params,
                    self.diffuser_cfg,
                    self.alphas_cumprod,
                    cond_half,
                    base_key,
                    guidance_scale,
                    n_steps,
                    self.compute_dtype,
                    reference=reference_latent,
                    mask=inpaint_mask,
                    use_cfg=use_cfg,
                    guidance_rescale=guidance_rescale,
                    concat_channels=concat_channels,
                    initial_noise=initial_noise, ip=ipd,
                    deepcache=deepcache, pag_scale=pag_scale,
                    head_steps=head_steps, ddim_eta=ddim_eta,
                    step_keys=step_keys, **ctl,
                )
            if profile_stages:
                fence(latent)

        if use_refiner:
            if self.refiner_params is None:
                raise ValueError("refiner weights not loaded")
            refiner_alphas = (
                self.refiner_alphas
                if self.refiner_alphas is not None
                else self.alphas_cumprod
            )
            # HBM budget planning (reference scopes each stage's VRAM the
            # same way, sample/main.rs:217-278): when base + refiner +
            # scan workspace exceed the budget, park the base UNet on host
            # for the refiner scan and restore it afterwards
            from ..utils.memory import (
                plan_refiner_mode,
                tree_is_on_host,
                tree_to_device,
                tree_to_host,
            )

            if self.mesh is not None:
                mode, reason = "resident", "multi-chip mesh (pooled HBM)"
            else:
                mode, reason = plan_refiner_mode(
                    self, resolution, cond.context_full.shape[0]
                )
            log(f"refiner mode: {mode} ({reason})")
            if mode == "scoped":
                with self.timer.stage("stage_swap_in"):
                    self.unet_params = tree_to_host(self.unet_params)
                    self.refiner_params = tree_to_device(self.refiner_params)
            elif tree_is_on_host(self.refiner_params):
                # fits resident: promote the host-parked refiner once
                self.refiner_params = tree_to_device(self.refiner_params)
            # per-image seeds: refiner re-noise for image i comes from
            # seeds[i] (fold_in stream 1), keeping the per-image-seed
            # contract through the two-stage path
            expert = denoising_end is not None
            if expert and int(refiner_alphas.shape[0]) != int(
                    self.alphas_cumprod.shape[0]):
                raise ValueError(
                    "denoising_end needs the base and refiner alpha-bar "
                    "tables to share one schedule (lengths "
                    f"{int(self.alphas_cumprod.shape[0])} vs "
                    f"{int(refiner_alphas.shape[0])})")
            # expert split: the tail continues the full grid's suffix from
            # the still-noisy handoff — no re-noise, step_start 0
            r_start = 0 if expert else refiner_step_start
            refiner_noise = None
            refiner_step_keys = None
            if seeds is not None:
                if not expert:
                    from .sampler import refiner_noise_per_seed

                    refiner_noise = refiner_noise_per_seed(
                        seeds, latent.shape)
                if sampler in K_STOCHASTIC or (sampler == "ddim"
                                               and ddim_eta > 0):
                    # per-image step noise for the refiner scan (stream 3);
                    # the tail schedule runs fewer steps than n_steps
                    from .sampler import (
                        ddim_timesteps,
                        k_step_keys_per_seed,
                        k_timesteps,
                    )

                    if expert:
                        n_tail = grid_total - head_steps
                    elif sampler == "ddim":
                        n_tail = len(ddim_timesteps(
                            refiner_step_start, n_steps,
                            int(refiner_alphas.shape[0])))
                    else:
                        n_tail = len(k_timesteps(
                            refiner_step_start, n_steps,
                            int(refiner_alphas.shape[0]),
                            spacing=(schedule if schedule in
                                     ("trailing", "leading") else "linspace"),
                        ))
                    refiner_step_keys = k_step_keys_per_seed(
                        seeds, n_tail, stream=3
                    )
            with self.timer.stage("refiner"):
                if sampler in K_SAMPLERS:
                    latent = k_refine_latent(
                        self.refiner_params, self.refiner_cfg, refiner_alphas,
                        latent, cond_half, refiner_key, guidance_scale,
                        r_start, n_steps, self.compute_dtype,
                        method=sampler, schedule=schedule,
                        noise=refiner_noise, step_keys=refiner_step_keys,
                        deepcache=deepcache,
                        renoise=not expert,
                        tail_from=head_steps if expert else 0,
                    )
                else:
                    latent = refine_latent(
                        self.refiner_params,
                        self.refiner_cfg,
                        refiner_alphas,
                        latent,
                        cond_half,
                        refiner_key,
                        guidance_scale,
                        r_start,
                        n_steps,
                        self.compute_dtype,
                        noise=refiner_noise,
                        deepcache=deepcache,
                        renoise=not expert,
                        tail_from=head_steps if expert else 0,
                        ddim_eta=ddim_eta,
                        step_keys=refiner_step_keys,
                    )
                if profile_stages:
                    fence(latent)
            if mode == "scoped":
                with self.timer.stage("stage_swap_out"):
                    fence(latent)  # refiner outputs must land first
                    self.refiner_params = tree_to_host(self.refiner_params)
                    self.unet_params = tree_to_device(self.unet_params)

        with self.timer.stage("vae_decode"):
            images = self._decode(latent)
            fence(images)
        if device_output:
            return images
        return np.asarray(images)

    def _txt2img_scheduled(
        self,
        sched,  # [(n_segment_steps, [prompt per image]), ...]
        resolution,
        n_steps,
        guidance_scale,
        seed,
        negative_prompt,
        sampler,
        schedule,
        guidance_rescale,
        no_cfg,
        device_output,
        profile_stages,
        ddim_eta: float = 0.0,
    ) -> np.ndarray:
        """Prompt-editing txt2img (pipeline/prompt_schedule.py): one
        conditioning per schedule segment, chained segmented scans
        (sampler.scheduled_sample_latent). Noise keys and step math match
        the unscheduled run exactly — a static prompt takes the ordinary
        path and a single-segment schedule is bitwise identical."""
        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} "
                             f"({'|'.join(SAMPLERS)})")
        if schedule != "linear" and sampler == "ddim":
            raise ValueError("--schedule applies to the euler/dpmpp "
                             "samplers")
        schedule = self._resolve_schedule(schedule)
        use_cfg = not (no_cfg or guidance_scale == 1.0)
        # one conditioning per segment; identical prompt lists hit the
        # same embedder jit cache, and uncond is cached pipeline-wide
        conds = []
        seg_lens = []
        for n_seg, seg_prompts in sched:
            c = self.conditioning(seg_prompts, resolution,
                                  negative_prompt=negative_prompt,
                                  profile_stages=profile_stages)
            conds.append(self._shard_cond(c.astype(self.compute_dtype)))
            seg_lens.append(n_seg)
        batch = conds[0].context_full.shape[0]

        seeds = None
        if not isinstance(seed, (int, np.integer)):
            seeds = list(seed)
            if len(seeds) != batch:
                raise ValueError(f"{len(seeds)} seeds for a {batch}-image "
                                 "batch")
            seed = seeds[0]
        initial_noise = None
        step_keys = None
        if seeds is not None:
            from .sampler import gen_noise_per_seed

            initial_noise = gen_noise_per_seed(seeds, conds[0])
            if sampler in K_STOCHASTIC or (sampler == "ddim"
                                           and ddim_eta > 0):
                from .sampler import ddim_timesteps, k_step_keys_per_seed

                n_keys = n_steps
                if sampler == "ddim":
                    n_keys = len(ddim_timesteps(
                        0, n_steps, int(self.alphas_cumprod.shape[0])))
                step_keys = k_step_keys_per_seed(seeds, n_keys)

        from .sampler import scheduled_sample_latent

        # same key layout as the plain path: PRNGKey(seed) splits into
        # (base, refiner); the base key drives the scan — so a resolved
        # static prompt is bit-identical to the unscheduled run
        base_key, _ = jax.random.split(jax.random.PRNGKey(seed))
        with self.timer.stage("diffuser"):
            latent = scheduled_sample_latent(
                self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                conds, seg_lens, base_key, guidance_scale,
                n_steps, self.compute_dtype, method=sampler,
                schedule=schedule, use_cfg=use_cfg,
                guidance_rescale=guidance_rescale,
                initial_noise=initial_noise, step_keys=step_keys,
                ddim_eta=ddim_eta,
            )
            if profile_stages:
                fence(latent)

        with self.timer.stage("vae_decode"):
            images = self._decode(latent)
            fence(images)
        return images if device_output else np.asarray(images)

    def txt2img_hires(
        self,
        prompts,
        resolution: Tuple[int, int] = (1024, 1024),
        hires_scale: float = 2.0,
        hires_strength: float = 0.3,
        n_steps: int = 30,
        guidance_scale: float = 7.5,
        seed: int = 0,
        negative_prompt: str = "",
        device_output: bool = False,
        sampler: str = "ddim",
        schedule: str = "linear",
        guidance_rescale: float = 0.0,
        no_cfg: bool = False,
    ) -> np.ndarray:
        """Two-pass high-resolution generation (hires-fix, capability
        extension): sample at the trained base resolution, bicubic-upscale
        the LATENT by hires_scale, then re-noise at hires_strength and
        denoise the schedule tail at the target size — the standard recipe
        for >1024² outputs without the repeated-subject artifacts direct
        high-res sampling causes (SDXL buckets, mod.rs:583-624).

        Latent-space upscale skips the decode/re-encode round trip of the
        image-space variant; one extra conditioning at the target size
        carries the correct size/crop micro-conditioning."""
        h, w = resolution
        hh = int(round(h * hires_scale / 8.0)) * 8
        hw = int(round(w * hires_scale / 8.0)) * 8
        if hires_scale <= 1.0:
            raise ValueError("hires_scale must be > 1")
        if not 0.0 < hires_strength <= 1.0:
            raise ValueError("hires_strength must be in (0, 1]")
        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} ({'|'.join(SAMPLERS)})")
        schedule = self._resolve_schedule(schedule)

        use_cfg = not (no_cfg or guidance_scale == 1.0)
        common = dict(
            guidance_scale=guidance_scale, compute_dtype=self.compute_dtype,
            use_cfg=use_cfg, guidance_rescale=guidance_rescale,
        )
        key = jax.random.PRNGKey(seed)
        base_key, hires_key = jax.random.split(key)

        cond = self._shard_cond(self.conditioning(
            prompts, resolution, negative_prompt=negative_prompt,
        ).astype(self.compute_dtype))
        if sampler == "lcm" and self.diffuser_cfg.time_cond_proj_dim:
            common["use_cfg"] = False
        with self.timer.stage("diffuser"):
            if sampler == "lcm":
                from .sampler import lcm_sample_latent

                lcm_common = dict(common)
                lcm_common.pop("guidance_rescale")
                latent = lcm_sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond, base_key, n_steps=n_steps, **lcm_common,
                )
            elif sampler in K_SAMPLERS:
                latent = euler_sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond, base_key, n_steps=n_steps, method=sampler,
                    schedule=schedule, **common,
                )
            else:
                latent = sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond, base_key, n_steps=n_steps, **common,
                )

        b = latent.shape[0]
        up = jax.image.resize(
            latent.astype(jnp.float32), (b, hh // 8, hw // 8, 4), "cubic"
        )
        cond_hi = self._shard_cond(self.conditioning(
            prompts, (hh, hw), negative_prompt=negative_prompt,
        ).astype(self.compute_dtype))
        step_start = int(round((1.0 - hires_strength) * 1000))
        with self.timer.stage("hires"):
            if sampler == "lcm":
                from .sampler import lcm_refine_latent

                lcm_common = dict(common)
                lcm_common.pop("guidance_rescale")
                latent = lcm_refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    up, cond_hi, hires_key, strength=hires_strength,
                    n_steps=n_steps, **lcm_common,
                )
            elif sampler in K_SAMPLERS:
                latent = k_refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    up, cond_hi, hires_key, step_start=step_start,
                    n_steps=n_steps, method=sampler, schedule=schedule,
                    **common,
                )
            else:
                latent = refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    up, cond_hi, hires_key, step_start=step_start,
                    n_steps=n_steps, **common,
                )

        with self.timer.stage("vae_decode"):
            images = self._decode(latent)
            fence(images)
        return images if device_output else np.asarray(images)

    def img2img(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        strength: float = 0.3,
        n_steps: int = 30,
        guidance_scale: float = 7.5,
        seed: int = 0,
        negative_prompt: str = "",
        device_output: bool = False,
        sampler: str = "ddim",
        schedule: str = "linear",
        guidance_rescale: float = 0.0,
        no_cfg: bool = False,
        control_image: Optional[np.ndarray] = None,
        control_scale: float = 1.0,
        control_start: float = 0.0,
        control_end: float = 1.0,
        ip_adapter_image: Optional[np.ndarray] = None,
        ip_adapter_scale: float = 0.6,
        deepcache: Optional[Tuple[int, int]] = None,
        pag_scale: float = 0.0,
        ddim_eta: float = 0.0,
    ) -> np.ndarray:
        """Strength-based image-to-image (capability extension).

        Generalizes the refiner's re-noise-and-denoise-the-tail mechanism
        (refine_latent, mod.rs:355-376) to the base model at an arbitrary
        strength in (0, 1]: encode the reference, re-noise at
        t = strength * 1000, run the remaining schedule with CFG.

        control_*: ControlNet guidance over the denoised tail (the window
        fractions are relative to the steps actually run).
        """
        if not 0.0 < strength <= 1.0:
            raise ValueError("strength must be in (0, 1]")
        _, height, width, _ = reference_images.shape
        cond = self._shard_cond(self.conditioning(
            [prompts] if isinstance(prompts, str) else prompts,
            (height, width), negative_prompt=negative_prompt,
        ).astype(self.compute_dtype))

        with self.timer.stage("vae_encode"):
            latent = self._encode(reference_images)

        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} ({'|'.join(SAMPLERS)})")
        if ddim_eta and sampler != "ddim":
            raise ValueError("ddim_eta applies to sampler='ddim' only (the "
                             "k-samplers have their own ancestral variants)")
        if schedule != "linear" and sampler in ("ddim", "lcm"):
            raise ValueError(
                "--schedule applies to the euler/dpmpp samplers; the DDIM "
                "and LCM schedules are fixed by their reference semantics"
            )
        schedule = self._resolve_schedule(schedule)
        ctl = self._control_kwargs(control_image, control_scale,
                                   control_start, control_end,
                                   (height, width),
                                   cond.context_full.shape[0])
        ipd = self._prep_ip(ip_adapter_image, ip_adapter_scale)
        # skip the first (1-strength) of the schedule
        step_start = int(round((1.0 - strength) * 1000))
        use_cfg = not (no_cfg or guidance_scale == 1.0)
        if sampler == "lcm" and self.diffuser_cfg.time_cond_proj_dim:
            use_cfg = False
        with self.timer.stage("diffuser"):
            if sampler == "lcm":
                from .sampler import lcm_refine_latent

                if deepcache is not None:
                    raise ValueError("deepcache is not supported with the "
                                     "LCM sampler (few-step by design)")
                if pag_scale:
                    raise ValueError("pag_scale does not apply to the LCM "
                                     "sampler")
                latent = lcm_refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    latent, cond, jax.random.PRNGKey(seed), guidance_scale,
                    strength, n_steps, compute_dtype=self.compute_dtype,
                    use_cfg=use_cfg, ip=ipd, **ctl,
                )
            elif sampler in K_SAMPLERS:
                latent = k_refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    latent, cond, jax.random.PRNGKey(seed), guidance_scale,
                    step_start, n_steps, self.compute_dtype, method=sampler,
                    schedule=schedule, use_cfg=use_cfg,
                    guidance_rescale=guidance_rescale, ip=ipd,
                    deepcache=deepcache, pag_scale=pag_scale, **ctl,
                )
            else:
                latent = refine_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    latent, cond, jax.random.PRNGKey(seed), guidance_scale,
                    step_start, n_steps, self.compute_dtype,
                    use_cfg=use_cfg, guidance_rescale=guidance_rescale,
                    ip=ipd, deepcache=deepcache, pag_scale=pag_scale,
                    ddim_eta=ddim_eta, **ctl,
                )

        with self.timer.stage("vae_decode"):
            images = self._decode(latent)
            fence(images)
        return images if device_output else np.asarray(images)

    def outpaint(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        pad: Tuple[int, int, int, int] = (0, 0, 0, 0),  # left,right,top,bottom
        fill: str = "edge",
        **kw,
    ) -> np.ndarray:
        """Outpainting: extend the canvas by `pad` pixels per side and
        generate the new border region (capability extension — the
        composition of canvas padding with the reference's crop_out
        inpainting mode, sample/main.rs:186-190: the original image
        occupies the crop window and everything OUTSIDE it is
        generated).

        fill: initial content of the new region before VAE encoding —
        "edge" (replicate border rows/cols, the standard seed for
        outpainting) or "noise" (uniform random u8). Pads must keep the
        padded canvas a multiple of 8. Accepts every inpaint/txt2img
        kwarg (sampler, steps, seed, ...); use a high step count like
        inpainting."""
        left, right, top, bottom = pad
        if min(pad) < 0 or max(pad) == 0:
            raise ValueError("pad needs at least one positive side "
                             "(left, right, top, bottom)")
        reference_images = np.asarray(reference_images)
        if reference_images.ndim == 3:
            reference_images = reference_images[None]
        b, h, w, _ = reference_images.shape
        nh, nw = h + top + bottom, w + left + right
        if nh % 8 or nw % 8:
            raise ValueError(
                f"padded canvas {nh}x{nw} must be a multiple of 8 "
                "(adjust the pad sizes)")
        if fill == "edge":
            canvas = np.pad(
                reference_images,
                ((0, 0), (top, bottom), (left, right), (0, 0)),
                mode="edge")
        elif fill == "noise":
            rng = np.random.default_rng(int(kw.get("seed", 0) or 0)
                                        if isinstance(kw.get("seed", 0),
                                                      (int, np.integer))
                                        else 0)
            canvas = rng.integers(0, 256, (b, nh, nw, 3),
                                  dtype=np.uint8)
            canvas[:, top:top + h, left:left + w] = reference_images
        else:
            raise ValueError(f"unknown fill {fill!r} (edge|noise)")
        # a padded canvas rarely lands on a trained bucket; degrade to the
        # warning (quality note) instead of the strict inpaint error —
        # plain inpaint keeps the reference's strict validation
        saved_strict = self.strict_resolutions
        self.strict_resolutions = False
        try:
            return self.inpaint(
                prompts, canvas,
                crop_left=left, crop_right=left + w,
                crop_top=top, crop_bottom=top + h,
                crop_out=True,  # generate OUTSIDE the original window
                **kw,
            )
        finally:
            self.strict_resolutions = saved_strict

    def ddim_invert(
        self,
        prompts,
        images: np.ndarray,  # [B, H, W, 3] uint8
        n_steps: int = 50,
        guidance_scale: float = 1.0,
        negative_prompt: str = "",
    ) -> np.ndarray:
        """DDIM inversion (see sampler.ddim_invert_latent): VAE-encode
        `images` and walk the deterministic DDIM chain backward under
        `prompts`, returning the [B,h,w,4] noisy latent at the schedule's
        first timestep. Feed it to txt2img(initial_latent=..., seed
        irrelevant) with the SAME n_steps and sampler='ddim': the source
        prompt reconstructs the input; an edit prompt performs
        inversion-based editing. guidance_scale 1 (the default) inverts
        the unguided field — the faithful-reconstruction setting."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        _, height, width, _ = images.shape
        cond = self._shard_cond(self.conditioning(
            [prompts] if isinstance(prompts, str) else prompts,
            (height, width), negative_prompt=negative_prompt,
        ).astype(self.compute_dtype))

        with self.timer.stage("vae_encode"):
            latent = self._encode(images)
            b = cond.context_full.shape[0]
            if latent.shape[0] == 1 and b > 1:
                latent = jnp.broadcast_to(latent, (b,) + latent.shape[1:])

        from .sampler import ddim_invert_latent

        with self.timer.stage("diffuser"):
            out = ddim_invert_latent(
                self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                latent, cond, guidance_scale, n_steps, self.compute_dtype,
                use_cfg=guidance_scale != 1.0,
            )
            fence(out)
        return np.asarray(out)

    def ip2p(
        self,
        prompts,
        edit_images: np.ndarray,  # [B or 1, H, W, 3] uint8
        n_steps: int = 30,
        guidance_scale: float = 7.5,
        image_guidance_scale: float = 1.5,
        seed: int = 0,
        negative_prompt: str = "",
        device_output: bool = False,
        sampler: str = "ddim",
        schedule: str = "linear",
        no_cfg: bool = False,
    ) -> np.ndarray:
        """InstructPix2Pix editing (Brooks et al. 2023, arXiv:2211.09800).

        Needs an 8-channel edit UNet (DiffuserConfig.in_channels == 8,
        e.g. timbrooks/instruct-pix2pix or an SDXL ip2p finetune —
        conv_in width is auto-detected at load like the 9-channel
        inpainting models). The prompt is the edit INSTRUCTION; denoising
        starts from pure noise at the image's own resolution with the
        edit image entering as 4 extra input channels.

        The edit image is VAE-encoded with the posterior MEAN and WITHOUT
        the latent scale factor — the ip2p training quirk: the original
        repo conditions on encode_first_stage(image).mode() unscaled, and
        diffusers' prepare_image_latents matches (no scaling_factor
        multiply). CFG is the paper's 3-way split combined as
        e_u + s_I*(e_img - e_u) + s_T*(e_txt - e_img) with
        s_T = guidance_scale and s_I = image_guidance_scale (typical
        settings 7.5 / 1.5); raising s_I sticks closer to the input
        image. no_cfg (or both scales 1) runs the conditional branch
        only. seed accepts a per-image sequence like txt2img.
        """
        if self.diffuser_cfg.in_channels != 8:
            raise ValueError(
                "InstructPix2Pix needs an 8-channel edit UNet (this "
                f"checkpoint has in_channels={self.diffuser_cfg.in_channels};"
                " e.g. timbrooks/instruct-pix2pix)")
        edit_images = np.asarray(edit_images)
        if edit_images.ndim == 3:
            edit_images = edit_images[None]
        _, height, width, _ = edit_images.shape
        if height % 8 or width % 8:
            raise ValueError(f"edit image {height}x{width} must be a "
                             "multiple of 8")
        cond = self.conditioning(
            [prompts] if isinstance(prompts, str) else prompts,
            (height, width), negative_prompt=negative_prompt,
        )
        cond_half = self._shard_cond(cond.astype(self.compute_dtype))
        batch = cond.context_full.shape[0]

        with self.timer.stage("vae_encode"):
            # scale_factor=1.0: unscaled posterior-mean latents (see above)
            edit_latents = self._encode(edit_images, scale_factor=1.0)
            if edit_latents.shape[0] == 1 and batch > 1:
                edit_latents = jnp.broadcast_to(
                    edit_latents, (batch,) + edit_latents.shape[1:])

        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r} "
                             f"({'|'.join(SAMPLERS)})")
        if sampler == "lcm":
            raise ValueError("the LCM sampler does not serve ip2p "
                             "checkpoints")
        if schedule != "linear" and sampler == "ddim":
            raise ValueError("--schedule applies to the euler/dpmpp "
                             "samplers")
        schedule = self._resolve_schedule(schedule)
        use_cfg = not (no_cfg
                       or (guidance_scale == 1.0
                           and image_guidance_scale == 1.0))

        seeds = None
        if not isinstance(seed, (int, np.integer)):
            seeds = list(seed)
            if len(seeds) != batch:
                raise ValueError(f"{len(seeds)} seeds for a {batch}-image "
                                 "batch")
            seed = seeds[0]
        initial_noise = None
        step_keys = None
        if seeds is not None:
            from .sampler import gen_noise_per_seed

            initial_noise = gen_noise_per_seed(seeds, cond_half)
            if sampler in K_STOCHASTIC:
                from .sampler import k_step_keys_per_seed

                step_keys = k_step_keys_per_seed(seeds, n_steps)

        key = jax.random.PRNGKey(seed)
        with self.timer.stage("diffuser"):
            if sampler in K_SAMPLERS:
                latent = euler_sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond_half, key, guidance_scale, n_steps,
                    self.compute_dtype, method=sampler, schedule=schedule,
                    use_cfg=use_cfg, concat_channels=edit_latents,
                    initial_noise=initial_noise, step_keys=step_keys,
                    edit=True, image_guidance_scale=image_guidance_scale,
                )
            else:
                latent = sample_latent(
                    self.unet_params, self.diffuser_cfg, self.alphas_cumprod,
                    cond_half, key, guidance_scale, n_steps,
                    self.compute_dtype, use_cfg=use_cfg,
                    concat_channels=edit_latents,
                    initial_noise=initial_noise,
                    edit=True, image_guidance_scale=image_guidance_scale,
                )
            fence(latent)

        with self.timer.stage("vae_decode"):
            images = self._decode(latent)
            fence(images)
        return images if device_output else np.asarray(images)

    def inpaint(
        self,
        prompts,
        reference_images: np.ndarray,  # [B, H, W, 3] uint8
        crop_left: Optional[int] = None,
        crop_right: Optional[int] = None,
        crop_top: Optional[int] = None,
        crop_bottom: Optional[int] = None,
        crop_out: bool = False,
        mask_image: Optional[np.ndarray] = None,
        mask_blur: float = 0.0,
        **kw,
    ) -> np.ndarray:
        """Crop-window latent inpainting (sample/main.rs:135-197), plus
        the mask-IMAGE surface (any >127 pixel in an 8x8 cell marks the
        cell generated — same semantics as the server's /v1/inpaint and
        the SD3/Flux families) and soft inpainting: mask_blur > 0
        (gaussian sigma, pixels) feathers the mask boundary and the
        per-step pin LERPS instead of selecting (sampler.inpaint_pin;
        A1111's mask_blur). mask_blur == 0 keeps the reference's exact
        hard-mask path bitwise."""
        _, height, width, _ = reference_images.shape
        if not validate_resolution(height, width):
            if self.strict_resolutions:
                raise ValueError(
                    f"Reference image dimensions {height}x{width} are "
                    f"incompatible. Compatible (H, W): {RESOLUTIONS}"
                )
            log(f"warning: {height}x{width} is not an SDXL-trained bucket "
                "(ok for this model family)")
        lh, lw = height // 8, width // 8
        if mask_image is not None or mask_blur > 0:
            from .masks import build_latent_mask

            mask = build_latent_mask(
                height, width, mask_image, crop_left, crop_right,
                crop_top, crop_bottom, crop_out, mask_blur=mask_blur)
            if mask_blur <= 0:
                # hard mask: keep the reference's exact bool pin path
                mask = mask.astype(bool)
            mask = jnp.broadcast_to(mask, (1, lh, lw, 4))
        else:
            crop_left = 0 if crop_left is None else crop_left
            crop_right = width if crop_right is None else crop_right
            crop_top = 0 if crop_top is None else crop_top
            crop_bottom = height if crop_bottom is None else crop_bottom
            if not (
                crop_right <= width and crop_bottom <= height
                and (crop_left < crop_right or crop_top < crop_bottom)
            ):
                raise ValueError("Invalid crop parameters.")

            # latent-space window (÷8), mask true = generated region
            scale = height // lh
            l, r = crop_left // scale, crop_right // scale
            t, b = crop_top // scale, crop_bottom // scale
            mask = np.zeros((1, lh, lw, 1), dtype=bool)
            mask[:, t:b, l:r, :] = True
            if crop_out:
                mask = ~mask
            mask = jnp.asarray(np.broadcast_to(mask, (1, lh, lw, 4)))

        return self.txt2img(
            prompts,
            resolution=(height, width),
            inpaint_reference=reference_images,
            inpaint_mask=mask,
            **kw,
        )


def random_pipeline(
    seed: int = 0,
    embedder_cfg: EmbedderConfig = SDXL_EMBEDDER,
    diffuser_cfg: DiffuserConfig = SDXL_BASE_DIFFUSER,
    refiner_cfg: Optional[DiffuserConfig] = None,
    vae_cfg: AutoencoderConfig = AutoencoderConfig(),
    compute_dtype=jnp.bfloat16,
    param_dtype_unet=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    stack_transformers: bool = False,
) -> SDXLPipeline:
    """Pipeline with random weights — bring-up, tests, benchmarks.

    stack_transformers=True scans the deep transformer stacks instead of
    unrolling: ~9x faster UNet compile for ~3% slower steps (good for
    interactive use; benchmarks keep it off).
    """
    from ..models.clip import init_clip
    from ..models.unet import fuse_unet_qkv, init_unet, stack_unet_transformers
    from ..models.vae import init_autoencoder

    # jit each init into ONE device program: the plain python inits issue
    # hundreds of tiny jax.random dispatches, which cost ~100 s of pure
    # dispatch latency over the axon tunnel (r2 warm-start measurement);
    # as single jitted programs they also hit the persistent compile cache
    j_clip = jax.jit(init_clip, static_argnums=(1, 2))
    j_unet = jax.jit(init_unet, static_argnums=(1, 2))
    j_vae = jax.jit(init_autoencoder, static_argnums=(1,))
    j_fuse = jax.jit(fuse_unet_qkv)

    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    log("initializing random weights (no checkpoint)")
    embedder_params = {
        "clip": j_clip(keys[0], embedder_cfg.clip_config, jnp.float32),
        "open_clip": j_clip(keys[1], embedder_cfg.open_clip_config, jnp.float32),
    }
    unet_params = j_fuse(
        j_unet(keys[2], diffuser_cfg.unet_config(), param_dtype_unet)
    )
    refiner_params = (
        j_fuse(j_unet(keys[3], refiner_cfg.unet_config(), param_dtype_unet))
        if refiner_cfg
        else None
    )
    if stack_transformers:
        unet_params = stack_unet_transformers(unet_params)
        if refiner_params is not None:
            refiner_params = stack_unet_transformers(refiner_params)
    vae_params = j_vae(keys[4], vae_cfg)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())

    return SDXLPipeline(
        embedder_cfg=embedder_cfg,
        embedder_params=embedder_params,
        diffuser_cfg=diffuser_cfg,
        unet_params=unet_params,
        alphas_cumprod=alphas,
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        refiner_cfg=refiner_cfg,
        refiner_params=refiner_params,
        refiner_alphas=alphas if refiner_cfg else None,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
        compute_dtype=compute_dtype,
    )
