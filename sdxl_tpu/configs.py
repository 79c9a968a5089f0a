"""Model configuration dataclasses.

JSON-compatible with the reference's burn `Config` .cfg files
(`Config::load`, /root/reference/src/bin/sample/main.rs:28-51):
  - CLIPConfig            (clip/mod.rs:19-28)
  - UNetConfig            (unet/mod.rs:59-69)
  - DiffuserConfig        (stablediffusion/mod.rs:269-278)
  - EmbedderConfig        (stablediffusion/mod.rs:626-630)
  - LatentDecoderConfig   (stablediffusion/mod.rs:176-179)

Field names match the burn structs so the same .cfg JSON files load
unchanged. Presets encode the SDXL 1.0 base/refiner hyperparameters
(SURVEY.md §2 "Model hyperparameters").
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class CLIPConfig:
    n_vocab: int = 49408
    n_state: int = 768
    embed_dim: int = 768
    n_head: int = 12
    n_ctx: int = 77
    n_layer: int = 12
    quick_gelu: bool = True

    @property
    def head_dim(self) -> int:
        return self.n_state // self.n_head


@dataclass(frozen=True)
class UNetConfig:
    adm_in_channels: int = 2816  # 0 = no label embedding (SD 1.x/2.x)
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    n_head_channels: int = 64
    transformer_depths: Tuple[int, ...] = (1, 2, 10)
    context_dim: int = 2048
    # which levels carry SpatialTransformers (SDXL: 1 and 2,
    # unet/mod.rs:125,264; SD 1.x/2.x: 0, 1 and 2 of four levels)
    transformer_levels: Tuple[int, ...] = (1, 2)
    # fixed head count (SD 1.x uses 8 heads at every width); 0 = derive
    # from n_head_channels (SDXL / SD 2.x)
    n_heads: int = 0
    # FreeU (Si et al. 2023, arXiv:2309.11497): (b1, b2, s1, s2) applied
    # at the two deepest decoder levels — backbone half-channel boost b,
    # skip low-frequency attenuation s. None = off (bit-exact reference
    # path). Runtime knob, not checkpoint state.
    freeu: Optional[Tuple[float, float, float, float]] = None
    # LCM-distilled UNets (arXiv:2310.04378): width of the guidance-scale
    # embedding consumed by time_embedding.cond_proj (diffusers
    # time_cond_proj_dim, typically 256). 0 = no cond_proj (everything
    # else, incl. LCM-LoRA over a standard UNet).
    time_cond_proj_dim: int = 0

    def __post_init__(self):
        object.__setattr__(self, "channel_mults", tuple(self.channel_mults))
        object.__setattr__(self, "transformer_depths", tuple(self.transformer_depths))
        object.__setattr__(self, "transformer_levels", tuple(self.transformer_levels))
        if self.freeu is not None:
            object.__setattr__(self, "freeu", tuple(self.freeu))
        if self.n_heads == 0:
            assert self.model_channels % self.n_head_channels == 0, (
                "The number of head channels must evenly divide the model channels."
            )

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


@dataclass(frozen=True)
class DiffuserConfig:
    adm_in_channels: int = 2816
    model_channels: int = 320
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_head_channels: int = 64
    transformer_depths: Tuple[int, ...] = (1, 2, 10)
    context_dim: int = 2048
    is_refiner: bool = False
    n_steps: int = 1000  # DDPM table length (stablediffusion/mod.rs:282)
    transformer_levels: Tuple[int, ...] = (1, 2)
    n_heads: int = 0  # 0 = derive from num_head_channels (SDXL)
    # "eps" (SDXL, SD1.x, SD2.x-base) or "v" (SD2.x-768): what the UNet
    # predicts; samplers convert v to eps via eps = sqrt(a)v + sqrt(1-a)x
    prediction_type: str = "eps"
    # 4 = standard latent UNet (reference, mod.rs:285-295); 9 = inpainting-
    # specialized models (latent + mask + masked-image latent concat)
    in_channels: int = 4
    # FreeU (b1, b2, s1, s2); None = off. See UNetConfig.freeu.
    freeu: Optional[Tuple[float, float, float, float]] = None
    # LCM-distilled UNet guidance-embedding width; see UNetConfig.
    time_cond_proj_dim: int = 0

    def __post_init__(self):
        object.__setattr__(self, "channel_mults", tuple(self.channel_mults))
        object.__setattr__(self, "transformer_depths", tuple(self.transformer_depths))
        object.__setattr__(self, "transformer_levels", tuple(self.transformer_levels))
        if self.freeu is not None:
            object.__setattr__(self, "freeu", tuple(self.freeu))

    def unet_config(self) -> UNetConfig:
        # The reference hardwires in/out = 4 latent channels
        # (stablediffusion/mod.rs:285-295); in_channels=9 extends to
        # inpainting-specialized checkpoints.
        return UNetConfig(
            adm_in_channels=self.adm_in_channels,
            in_channels=self.in_channels,
            out_channels=4,
            model_channels=self.model_channels,
            channel_mults=self.channel_mults,
            n_head_channels=self.num_head_channels,
            transformer_depths=self.transformer_depths,
            context_dim=self.context_dim,
            transformer_levels=self.transformer_levels,
            n_heads=self.n_heads,
            freeu=self.freeu,
            time_cond_proj_dim=self.time_cond_proj_dim,
        )


@dataclass(frozen=True)
class EmbedderConfig:
    clip_config: CLIPConfig = field(default_factory=CLIPConfig)
    open_clip_config: CLIPConfig = field(
        default_factory=lambda: OPEN_CLIP_BIGG_CONFIG
    )


@dataclass(frozen=True)
class LatentDecoderConfig:
    scale_factor: float = 0.13025  # dumped from sgm (python/dump.py:37)


@dataclass(frozen=True)
class AutoencoderConfig:
    """VAE channel plan (autoencoder/mod.rs:29-35)."""

    encoder_channels: Tuple[Tuple[int, int], ...] = (
        (128, 128),
        (128, 256),
        (256, 512),
        (512, 512),
    )
    decoder_channels: Tuple[Tuple[int, int], ...] = (
        (512, 512),
        (512, 512),
        (512, 256),
        (256, 128),
    )
    n_group: int = 32
    n_channels_out: int = 8  # encoder quant channels (4 mean + 4 logvar)
    latent_channels: int = 4


# ---------------------------------------------------------------------------
# SDXL 1.0 presets (SURVEY.md §2 hyperparameter table)
# ---------------------------------------------------------------------------

# FreeU per-family defaults (b1, b2, s1, s2) from the official repo's
# recommended settings (github.com/ChenyangSi/FreeU README)
FREEU_DEFAULTS = {
    "sdxl": (1.3, 1.4, 0.9, 0.2),
    "sd1": (1.5, 1.6, 0.9, 0.2),
    "sd2": (1.4, 1.6, 0.9, 0.2),
}

def parse_freeu_spec(spec: str, family: str) -> Tuple[float, float, float, float]:
    """CLI --freeu value -> (b1, b2, s1, s2). "auto" (bare --freeu) picks
    the family default; otherwise a comma list of four floats."""
    if spec == "auto":
        return FREEU_DEFAULTS[family]
    parts = spec.split(",")
    if len(parts) != 4:
        raise ValueError(f"--freeu expects B1,B2,S1,S2 (got {spec!r})")
    return tuple(float(v) for v in parts)


CLIP_VIT_L_CONFIG = CLIPConfig(
    n_vocab=49408, n_state=768, embed_dim=768, n_head=12, n_ctx=77, n_layer=12,
    quick_gelu=True,
)

OPEN_CLIP_BIGG_CONFIG = CLIPConfig(
    n_vocab=49408, n_state=1280, embed_dim=1280, n_head=20, n_ctx=77, n_layer=32,
    quick_gelu=False,
)

SDXL_BASE_DIFFUSER = DiffuserConfig(
    adm_in_channels=2816,
    model_channels=320,
    channel_mults=(1, 2, 4),
    num_head_channels=64,
    transformer_depths=(1, 2, 10),
    context_dim=2048,
    is_refiner=False,
)

SDXL_REFINER_DIFFUSER = DiffuserConfig(
    adm_in_channels=2560,
    model_channels=384,
    channel_mults=(1, 2, 4, 4),
    num_head_channels=64,
    transformer_depths=(4, 4, 4, 4),
    context_dim=1280,
    is_refiner=True,
)

SDXL_EMBEDDER = EmbedderConfig(
    clip_config=CLIP_VIT_L_CONFIG, open_clip_config=OPEN_CLIP_BIGG_CONFIG
)


# ---------------------------------------------------------------------------
# SD 1.x / 2.x presets (capability extension beyond the SDXL-only reference;
# same config-driven UNet generator, different knobs)
# ---------------------------------------------------------------------------

# SD 1.4/1.5: 4 levels, transformers at 0-2 (depth 1), FIXED 8 heads at
# every width, single CLIP ViT-L context (768), no label embedding.
SD15_DIFFUSER = DiffuserConfig(
    adm_in_channels=0,
    model_channels=320,
    channel_mults=(1, 2, 4, 4),
    num_head_channels=64,  # unused (n_heads set)
    transformer_depths=(1, 1, 1, 1),
    context_dim=768,
    transformer_levels=(0, 1, 2),
    n_heads=8,
)

# SD 2.x (512-base, eps-prediction): OpenCLIP ViT-H context (1024),
# head width 64 like SDXL, transformers at levels 0-2.
SD2_DIFFUSER = DiffuserConfig(
    adm_in_channels=0,
    model_channels=320,
    channel_mults=(1, 2, 4, 4),
    num_head_channels=64,
    transformer_depths=(1, 1, 1, 1),
    context_dim=1024,
    transformer_levels=(0, 1, 2),
)

# SD 2.1-768: same architecture, v-prediction objective
SD21_768_DIFFUSER = DiffuserConfig(
    adm_in_channels=0,
    model_channels=320,
    channel_mults=(1, 2, 4, 4),
    num_head_channels=64,
    transformer_depths=(1, 1, 1, 1),
    context_dim=1024,
    transformer_levels=(0, 1, 2),
    prediction_type="v",
)

# SD 1.x text tower = OpenAI CLIP ViT-L (same as SDXL's first tower);
# SD 2.x = OpenCLIP ViT-H (1024 wide, 23 layers used at penultimate).
OPEN_CLIP_VITH_CONFIG = CLIPConfig(
    n_vocab=49408, n_state=1024, embed_dim=1024, n_head=16, n_ctx=77,
    n_layer=24, quick_gelu=False,
)

SD15_VAE_SCALE = 0.18215  # vs SDXL's 0.13025


# ---------------------------------------------------------------------------
# SD3 family (MMDiT, arXiv:2403.03206) — capability extension beyond the
# reference's SDXL/SD1/SD2 surface. Hyperparameters follow the public
# sd3-medium release (diffusers SD3Transformer2DModel config).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MMDiTConfig:
    """Multimodal Diffusion Transformer (SD3's denoiser)."""

    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    n_heads: int = 24
    head_dim: int = 64  # hidden = n_heads * head_dim (sd3-medium: 1536)
    # token-stream context width BEFORE the context_embedder projection
    # (T5-XXL d_model; the CLIP 2048-wide half is zero-padded up to this)
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 2048  # CLIP-L (768) + CLIP-G (1280)
    pos_embed_max_size: int = 192
    # "rms" enables per-head RMS q/k normalization (SD3.5); sd3-medium
    # ships without it
    qk_norm: str = ""
    # SD3.5-medium: block indices with an EXTRA plain self-attention on
    # the latent stream (attn2) driven by a 9-way adaLN modulation
    # (diffusers dual_attention_layers; empty for sd3-medium/3.5-large)
    dual_attention_layers: Tuple[int, ...] = ()
    # timestep sinusoid width before the MLP (diffusers Timesteps(256))
    time_sinusoid_dim: int = 256

    def __post_init__(self):
        object.__setattr__(self, "dual_attention_layers",
                           tuple(self.dual_attention_layers))

    @property
    def hidden(self) -> int:
        return self.n_heads * self.head_dim


@dataclass(frozen=True)
class T5Config:
    """T5 v1.1 encoder (gated-gelu). Defaults = T5-XXL (SD3's tokenizer_3
    / text_encoder_3)."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    n_heads: int = 64
    n_layers: int = 24
    relative_buckets: int = 32
    relative_max_distance: int = 128
    layer_norm_eps: float = 1e-6


SD3_MEDIUM_MMDIT = MMDiTConfig()
T5_XXL_CONFIG = T5Config()

# SD3's 16-channel VAE: same conv topology as SDXL's, wider latent
SD3_VAE_CONFIG_KW = dict(n_channels_out=32, latent_channels=16)
SD3_VAE_SCALE = 1.5305
SD3_VAE_SHIFT = 0.0609  # latent = (z - shift) * scale at encode
SD3_FLOW_SHIFT = 3.0  # flow-matching timestep shift (sd3-medium default)


# ---------------------------------------------------------------------------
# Flux family (capability extension): the FLUX.1 rectified-flow
# transformer — double-stream (img/txt) blocks followed by single-stream
# blocks over the concatenated tokens, 3-axis RoPE instead of learned /
# sincos positions. Hyperparameters follow the public FLUX.1-dev/schnell
# releases (diffusers FluxTransformer2DModel config).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FluxConfig:
    """FLUX.1 denoiser (double + single stream DiT, RoPE)."""

    # tokens are PRE-PACKED 2x2 latent patches: 16-ch latent -> 64-wide
    in_channels: int = 64
    num_layers: int = 19         # double-stream (img/txt) blocks
    num_single_layers: int = 38  # single-stream blocks on [txt ⧺ img]
    n_heads: int = 24
    head_dim: int = 128          # hidden = 3072
    joint_attention_dim: int = 4096  # T5-XXL token stream
    pooled_projection_dim: int = 768  # CLIP-L pooler_output (unprojected)
    # dev is guidance-distilled: a second sinusoid-MLP embeds the
    # guidance scale into temb; schnell ships without it
    guidance_embeds: bool = True
    # per-axis RoPE widths over the (id, row, col) position ids;
    # sums to head_dim
    axes_dims: Tuple[int, ...] = (16, 56, 56)
    rope_theta: int = 10000
    time_sinusoid_dim: int = 256
    mlp_ratio: int = 4

    def __post_init__(self):
        object.__setattr__(self, "axes_dims", tuple(self.axes_dims))
        if sum(self.axes_dims) != self.head_dim:
            raise ValueError(f"axes_dims {self.axes_dims} must sum to "
                             f"head_dim {self.head_dim}")

    @property
    def hidden(self) -> int:
        return self.n_heads * self.head_dim


FLUX_DEV = FluxConfig()
FLUX_SCHNELL = FluxConfig(guidance_embeds=False)

# FLUX.1 16-channel VAE normalization (diffusers vae/config.json)
FLUX_VAE_SCALE = 0.3611
FLUX_VAE_SHIFT = 0.1159
# dynamic-shift schedule endpoints (FluxPipeline/scheduler config)
FLUX_BASE_SHIFT = 0.5
FLUX_MAX_SHIFT = 1.15


# ---------------------------------------------------------------------------
# burn .cfg JSON interop
# ---------------------------------------------------------------------------

def _from_dict(cls, data):
    if dataclasses.is_dataclass(cls) and isinstance(data, dict):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in data.items():
            if k not in fields:
                continue  # tolerate extra keys (burn serializes all fields)
            ftype = fields[k].type
            if k.endswith("_config"):
                kwargs[k] = _from_dict(CLIPConfig, v)
            else:
                kwargs[k] = _deep_tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)
    return data


def _deep_tuple(v):
    """Lists -> tuples recursively: nested channel plans (e.g.
    AutoencoderConfig's tuple-of-pairs) must load back hashable, since
    frozen configs are jit static arguments."""
    return tuple(_deep_tuple(x) if isinstance(x, list) else x for x in v)


def load_cfg(path: str, cls):
    """Load a burn-format .cfg JSON file into a config dataclass."""
    with open(path, "r", encoding="utf-8") as f:
        return _from_dict(cls, json.load(f))


def save_cfg(path: str, cfg) -> None:
    def encode(obj):
        if dataclasses.is_dataclass(obj):
            return {
                f.name: encode(getattr(obj, f.name)) for f in dataclasses.fields(obj)
            }
        if isinstance(obj, tuple):
            return list(obj)
        return obj

    with open(path, "w", encoding="utf-8") as f:
        json.dump(encode(cfg), f, indent=2)
