"""FLUX.1 — rectified-flow transformer (Black Forest Labs).

Capability extension beyond the reference (which ships SDXL/SD1/SD2
UNets); implements the exact layer semantics of the public FLUX.1
releases (diffusers `FluxTransformer2DModel`) as pytrees + pure
functions:

  - tokens are pre-packed 2x2 latent patches (16-ch latent -> 64-wide
    tokens), embedded by one linear (x_embedder); the T5 token stream
    enters through context_embedder
  - temb = MLP(timestep sinusoid 256) [+ MLP(guidance sinusoid) on the
    guidance-distilled dev model] + MLP(CLIP-L pooled); sinusoid inputs
    are sigma*1000 and guidance_scale*1000 (the transformer's own *1000)
  - positions are 3-axis rotary embeddings (RoPE) over (id, row, col)
    ids with per-axis widths (16, 56, 56), theta 10000, cos/sin
    repeat-interleaved pairs (diffusers get_1d_rotary_pos_embed with
    repeat_interleave_real=True); text tokens sit at position 0
  - num_layers DOUBLE-stream blocks: adaLN-Zero per stream (6-way chunk,
    shift first), one joint attention over [txt ⧺ img] (TEXT FIRST — the
    opposite of SD3's concat order) with per-head RMS q/k norms and RoPE,
    per-stream gated residuals + GELU(tanh) MLPs (ratio 4)
  - num_single_layers SINGLE-stream blocks on the concatenated tokens:
    3-way adaLN (shift/scale/gate), attention and a parallel 4x MLP from
    the SAME normed input, fused back by one projection of
    [attn ⧺ gelu(mlp)] — gated residual
  - final AdaLayerNormContinuous (scale first) + linear to 64 channels

All module/param names mirror the public checkpoint layout so the
diffusers loader (io/flux.py) is a rename-free walk.

TPU notes: one jitted program; the [txt ⧺ img] sequence is 4608 tokens
at 1024^2 (512 T5 + 4096 packed) and rides the same qkv_attention /
Pallas flash routing as the UNet and MMDiT; bf16 matmuls with f32
norm/modulation islands; RoPE tables are computed once per (h, w) at
trace time and folded into the program as constants.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import FluxConfig
from ..ops.attention import qkv_attention
from ..ops.embeddings import timestep_embedding
from ..ops.linear import linear
from .mmdit import _ln_nomod, _rms_head, _split_heads


# ---------------------------------------------------------------------------
# rotary position embeddings
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def rope_tables(cfg: FluxConfig, gh: int, gw: int, n_txt: int,
                cond_gh: int = 0,
                cond_gw: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) [n_txt + gh*gw (+ cond_gh*cond_gw), head_dim] f32 — the
    FluxPosEmbed tables for text ids (all-zero rows) followed by image
    ids (axis 1 = row, axis 2 = column), each axis d_i wide with
    frequencies theta^(-2j/d_i) repeat-interleaved into cos/sin pairs.

    cond_gh/cond_gw append a SECOND image grid whose first id axis is 1
    instead of 0 — the Kontext in-context reference-image stream (the
    public FluxKontextPipeline sets image_ids[..., 0] = 1 to separate
    the clean reference tokens from the denoised target tokens)."""
    txt_ids = np.zeros((n_txt, 3), np.float64)
    img_ids = np.zeros((gh, gw, 3), np.float64)
    img_ids[..., 1] += np.arange(gh)[:, None]
    img_ids[..., 2] += np.arange(gw)[None, :]
    ids = np.concatenate([txt_ids, img_ids.reshape(-1, 3)], axis=0)
    if cond_gh and cond_gw:
        cond_ids = np.zeros((cond_gh, cond_gw, 3), np.float64)
        cond_ids[..., 0] = 1.0
        cond_ids[..., 1] += np.arange(cond_gh)[:, None]
        cond_ids[..., 2] += np.arange(cond_gw)[None, :]
        ids = np.concatenate([ids, cond_ids.reshape(-1, 3)], axis=0)

    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(cfg.axes_dims):
        freqs = 1.0 / cfg.rope_theta ** (
            np.arange(0, dim, 2, dtype=np.float64) / dim)
        out = np.outer(ids[:, axis], freqs)  # [T, dim/2]
        cos_parts.append(np.repeat(np.cos(out), 2, axis=1))
        sin_parts.append(np.repeat(np.sin(out), 2, axis=1))
    cos = np.concatenate(cos_parts, axis=1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=1).astype(np.float32)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, hd] rotated pairwise: out = x*cos + rot(x)*sin with
    rot interleaving (-x_odd, x_even) — diffusers apply_rotary_emb
    (use_real, unbind_dim=-1) in f32 like the public processor."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    out = xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _rope_attention(q, k, v, cos, sin, p, cfg: FluxConfig):
    """Per-head RMS q/k norm, RoPE, then the shared attention routing.
    q/k/v are [B, T, hidden]; norms use the given param dict's
    norm_q/norm_k weights."""
    n_head = cfg.n_heads
    q = _rms_head(_split_heads(q, n_head), p["norm_q"]["w"])
    k = _rms_head(_split_heads(k, n_head), p["norm_k"]["w"])
    q = apply_rope(q, cos, sin).reshape(q.shape[0], q.shape[1], -1)
    k = apply_rope(k, cos, sin).reshape(k.shape[0], k.shape[1], -1)
    return qkv_attention(q, k, v, None, n_head)


def _double_block(p, x, c, temb, cos, sin, cfg: FluxConfig):
    """FluxTransformerBlock: joint attention over [txt ⧺ img] (text
    first), per-stream adaLN-Zero modulation and MLPs."""
    mod = jnp.split(linear(p["norm1"]["mod"], jax.nn.silu(temb)), 6, -1)
    sh, sc, g, sh2, sc2, g2 = mod
    cmod = jnp.split(linear(p["norm1_context"]["mod"], jax.nn.silu(temb)),
                     6, -1)
    csh, csc, cg, csh2, csc2, cg2 = cmod

    nx = _ln_nomod(x) * (1 + sc[:, None]) + sh[:, None]
    nc = _ln_nomod(c) * (1 + csc[:, None]) + csh[:, None]

    a = p["attn"]
    q = jnp.concatenate([linear(a["add_q_proj"], nc),
                         linear(a["to_q"], nx)], axis=1)
    k = jnp.concatenate([linear(a["add_k_proj"], nc),
                         linear(a["to_k"], nx)], axis=1)
    v = jnp.concatenate([linear(a["add_v_proj"], nc),
                         linear(a["to_v"], nx)], axis=1)
    # the txt half normalizes with norm_added_*, the img half with norm_*
    n_head, lt = cfg.n_heads, c.shape[1]
    qh = _split_heads(q, n_head)
    qh = jnp.concatenate([
        _rms_head(qh[:, :lt], a["norm_added_q"]["w"]),
        _rms_head(qh[:, lt:], a["norm_q"]["w"])], axis=1)
    kh = _split_heads(k, n_head)
    kh = jnp.concatenate([
        _rms_head(kh[:, :lt], a["norm_added_k"]["w"]),
        _rms_head(kh[:, lt:], a["norm_k"]["w"])], axis=1)
    qh = apply_rope(qh, cos, sin).reshape(q.shape)
    kh = apply_rope(kh, cos, sin).reshape(k.shape)
    att = qkv_attention(qh, kh, v, None, n_head)
    ac, ax = att[:, :lt], att[:, lt:]

    x = x + g[:, None] * linear(a["to_out"], ax)
    nx2 = _ln_nomod(x) * (1 + sc2[:, None]) + sh2[:, None]
    x = x + g2[:, None] * linear(
        p["mlp"]["out"], jax.nn.gelu(linear(p["mlp"]["in"], nx2),
                                     approximate=True))

    c = c + cg[:, None] * linear(a["to_add_out"], ac)
    nc2 = _ln_nomod(c) * (1 + csc2[:, None]) + csh2[:, None]
    c = c + cg2[:, None] * linear(
        p["mlp_context"]["out"],
        jax.nn.gelu(linear(p["mlp_context"]["in"], nc2), approximate=True))
    return x, c


def _single_block(p, x, temb, cos, sin, cfg: FluxConfig):
    """FluxSingleTransformerBlock: attention and a parallel 4x MLP from
    one normed input, fused by proj_out([attn ⧺ gelu(mlp)])."""
    sh, sc, g = jnp.split(linear(p["norm"]["mod"], jax.nn.silu(temb)), 3, -1)
    nx = _ln_nomod(x) * (1 + sc[:, None]) + sh[:, None]
    a = p["attn"]
    att = _rope_attention(linear(a["to_q"], nx), linear(a["to_k"], nx),
                          linear(a["to_v"], nx), cos, sin, a, cfg)
    mlp = jax.nn.gelu(linear(p["proj_mlp"], nx), approximate=True)
    return x + g[:, None] * linear(
        p["proj_out"], jnp.concatenate([att, mlp], axis=-1))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def flux_forward(
    params,
    cfg: FluxConfig,
    latent: jnp.ndarray,     # [B, h, w, 16] NHWC latent (UNPACKED)
    timesteps: jnp.ndarray,  # [B] sigma*1000 (continuous, like the MMDiT)
    context: jnp.ndarray,    # [B, T_txt, joint_attention_dim] T5 stream
    pooled: jnp.ndarray,     # [B, pooled_projection_dim] CLIP-L pooled
    guidance: Optional[jnp.ndarray] = None,  # [B] guidance_scale*1000
    skip_layers: tuple = (),  # double-block indices to omit (SLG-style)
    cond_latent: Optional[jnp.ndarray] = None,  # [B, ch2, cw2, 16] Kontext
) -> jnp.ndarray:
    """Velocity prediction [B, h, w, 16].

    Packing (the pipeline's _pack_latents 2x2 grouping) and unpacking
    happen here so callers see the plain latent; the packed grid is
    (h/2, w/2) and the RoPE row/col ids index that grid.

    cond_latent is the Kontext in-context editing stream (public
    FluxKontextPipeline): the CLEAN reference image's latent, packed and
    CONCATENATED after the target tokens in the image stream with its
    RoPE ids offset on axis 0 (= 1); the velocity is returned for the
    target tokens only (the pipeline discards the reference rows)."""
    dtype = latent.dtype
    b, h, w, ch = latent.shape
    gh, gw = h // 2, w // 2

    def pack(lat):
        # _pack_latents channel order: (C, 2, 2) — channel-major, then
        # the 2x2 spatial offsets — so x_embedder weights load rename-free
        bb, hh, ww, cc = lat.shape
        p = lat.reshape(bb, hh // 2, 2, ww // 2, 2, cc)
        return p.transpose(0, 1, 3, 5, 2, 4).reshape(
            bb, (hh // 2) * (ww // 2), 4 * cc)

    xp = pack(latent)
    n_target = xp.shape[1]
    cond_gh = cond_gw = 0
    if cond_latent is not None:
        cond_gh = cond_latent.shape[1] // 2
        cond_gw = cond_latent.shape[2] // 2
        xp = jnp.concatenate([xp, pack(cond_latent.astype(dtype))], axis=1)

    x = linear(params["x_embedder"], xp)
    c = linear(params["context_embedder"], context.astype(dtype))

    te = params["time_text_embed"]
    t_sin = timestep_embedding(timesteps, cfg.time_sinusoid_dim).astype(dtype)
    temb = linear(te["timestep_lin2"],
                  jax.nn.silu(linear(te["timestep_lin1"], t_sin)))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("this checkpoint is guidance-distilled "
                             "(guidance_embeds): pass guidance")
        g_sin = timestep_embedding(
            guidance, cfg.time_sinusoid_dim).astype(dtype)
        temb = temb + linear(te["guidance_lin2"],
                             jax.nn.silu(linear(te["guidance_lin1"], g_sin)))
    temb = temb + linear(te["text_lin2"],
                         jax.nn.silu(linear(te["text_lin1"],
                                            pooled.astype(dtype))))

    cos_np, sin_np = rope_tables(cfg, gh, gw, context.shape[1],
                                 cond_gh, cond_gw)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    for i, blk in enumerate(params["blocks"]):
        if i in skip_layers:
            continue
        x, c = _double_block(blk, x, c, temb, cos, sin, cfg)

    xs = jnp.concatenate([c, x], axis=1)  # text first
    for blk in params["single_blocks"]:
        xs = _single_block(blk, xs, temb, cos, sin, cfg)
    # target tokens only (reference rows are conditioning, not output)
    x = xs[:, c.shape[1]:c.shape[1] + n_target]

    m = linear(params["norm_out"]["mod"], jax.nn.silu(temb))
    sc, sh = jnp.split(m, 2, axis=-1)  # AdaLayerNormContinuous: scale first
    x = _ln_nomod(x) * (1 + sc[:, None]) + sh[:, None]
    out = linear(params["proj_out"], x)

    out = out.reshape(b, gh, gw, ch, 2, 2)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, ch)


# ---------------------------------------------------------------------------
# init (tests / bring-up without real weights)
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype, scale=0.02):
    kw, = jax.random.split(key, 1)
    return {
        "w": jax.random.normal(kw, (d_in, d_out), dtype) * scale,
        "b": jnp.zeros((d_out,), dtype),
    }


def _init_double(key, cfg: FluxConfig, dtype):
    hdim = cfg.hidden
    ks = iter(jax.random.split(key, 16))
    attn = {
        nm: _dense(next(ks), hdim, hdim, dtype)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_out", "to_add_out")
    }
    for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
        attn[nm] = {"w": jnp.ones((cfg.head_dim,), dtype)}
    return {
        "norm1": {"mod": _dense(next(ks), hdim, 6 * hdim, dtype)},
        "norm1_context": {"mod": _dense(next(ks), hdim, 6 * hdim, dtype)},
        "attn": attn,
        "mlp": {"in": _dense(next(ks), hdim, cfg.mlp_ratio * hdim, dtype),
                "out": _dense(next(ks), cfg.mlp_ratio * hdim, hdim, dtype)},
        "mlp_context": {
            "in": _dense(next(ks), hdim, cfg.mlp_ratio * hdim, dtype),
            "out": _dense(next(ks), cfg.mlp_ratio * hdim, hdim, dtype)},
    }


def _init_single(key, cfg: FluxConfig, dtype):
    hdim = cfg.hidden
    ks = iter(jax.random.split(key, 8))
    attn = {nm: _dense(next(ks), hdim, hdim, dtype)
            for nm in ("to_q", "to_k", "to_v")}
    for nm in ("norm_q", "norm_k"):
        attn[nm] = {"w": jnp.ones((cfg.head_dim,), dtype)}
    return {
        "norm": {"mod": _dense(next(ks), hdim, 3 * hdim, dtype)},
        "attn": attn,
        "proj_mlp": _dense(next(ks), hdim, cfg.mlp_ratio * hdim, dtype),
        "proj_out": _dense(next(ks), (1 + cfg.mlp_ratio) * hdim, hdim,
                           dtype),
    }


def init_flux(key, cfg: FluxConfig, dtype=jnp.float32):
    hdim = cfg.hidden
    ks = iter(jax.random.split(key, cfg.num_layers
                               + cfg.num_single_layers + 12))
    te = {
        "timestep_lin1": _dense(next(ks), cfg.time_sinusoid_dim, hdim,
                                dtype),
        "timestep_lin2": _dense(next(ks), hdim, hdim, dtype),
        "text_lin1": _dense(next(ks), cfg.pooled_projection_dim, hdim,
                            dtype),
        "text_lin2": _dense(next(ks), hdim, hdim, dtype),
    }
    if cfg.guidance_embeds:
        te["guidance_lin1"] = _dense(next(ks), cfg.time_sinusoid_dim, hdim,
                                     dtype)
        te["guidance_lin2"] = _dense(next(ks), hdim, hdim, dtype)
    return {
        "x_embedder": _dense(next(ks), cfg.in_channels, hdim, dtype),
        "context_embedder": _dense(next(ks), cfg.joint_attention_dim, hdim,
                                   dtype),
        "time_text_embed": te,
        "blocks": [_init_double(next(ks), cfg, dtype)
                   for _ in range(cfg.num_layers)],
        "single_blocks": [_init_single(next(ks), cfg, dtype)
                          for _ in range(cfg.num_single_layers)],
        "norm_out": {"mod": _dense(next(ks), hdim, 2 * hdim, dtype)},
        "proj_out": _dense(next(ks), hdim, cfg.in_channels, dtype),
    }
