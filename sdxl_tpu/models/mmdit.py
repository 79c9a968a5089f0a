"""MMDiT — the SD3 family's Multimodal Diffusion Transformer.

Capability extension beyond the reference (which ships SDXL/SD1/SD2
UNets); implements the architecture of Esser et al. 2024
(arXiv:2403.03206) with the exact layer semantics of the public
sd3-medium release (diffusers `SD3Transformer2DModel`), as pytrees +
pure functions in NHWC:

  - 2x2 conv patchify + fixed 2D sin/cos positional grid, computed over
    a pos_embed_max_size x pos_embed_max_size grid scaled to
    base_size = 64 and CENTER-CROPPED to the latent grid (so one weight
    set serves every resolution)
  - conditioning vector temb = MLP(timestep sinusoid 256) +
    MLP(pooled CLIP 2048) — both SiLU MLPs into the hidden width
  - context_embedder: one linear taking the 4096-wide token stream
    ([CLIP-L ⧺ CLIP-G zero-padded] ⧺ T5) into the hidden width
  - num_layers JointTransformerBlocks: two token streams (latent x,
    context c) each with adaLN-Zero modulation (6-way chunk:
    shift/scale/gate for attn and mlp — SHIFT FIRST, the AdaLayerNormZero
    order), one JOINT self-attention over the concatenated [x ⧺ c]
    tokens with per-stream q/k/v/out projections, gated residuals, and
    per-stream GELU(tanh) MLPs (ratio 4). The LAST block is
    context_pre_only: the context stream is normalized with a 2-way
    (SCALE FIRST, the AdaLayerNormContinuous order) modulation, feeds
    the joint attention, but has no output projection / MLP.
  - optional per-head RMS q/k normalization (SD3.5's qk_norm="rms")
  - final AdaLayerNormContinuous + linear to patch_size^2*out_channels,
    unpatchify

All module/param names mirror the public checkpoint layout so the
diffusers loader (io/sd3.py) is a rename-free walk.

TPU notes: everything is one jitted program; attention sequence length
is HW/4 + 333 tokens (4429 at 1024^2) — routed through the same
qkv_attention/flash path as the UNet; bf16 matmuls with f32
norm/softmax/modulation islands.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import MMDiTConfig
from ..ops.attention import qkv_attention
from ..ops.embeddings import timestep_embedding
from ..ops.linear import linear
from ..ops.norms import layernorm_affine

# ---------------------------------------------------------------------------
# positional grid (transcribed from diffusers get_2d_sincos_pos_embed /
# PatchEmbed.cropped_pos_embed; note the public code's grid[0] carries the
# W coordinate — the "emb_h uses grid[0]" naming quirk is preserved so a
# real checkpoint sees the grid it was trained with)
# ---------------------------------------------------------------------------


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = np.outer(pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


@functools.lru_cache(maxsize=8)
def _pos_grid(embed_dim: int, grid_size: int, base_size: int) -> np.ndarray:
    """[grid, grid, embed_dim] f32 sin/cos grid (diffusers semantics)."""
    coords = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size)
    gw, gh = np.meshgrid(coords, coords)  # np.meshgrid(grid_w, grid_h)
    emb_a = _sincos_1d(embed_dim // 2, gw)  # grid[0]: the W coordinate
    emb_b = _sincos_1d(embed_dim // 2, gh)  # grid[1]: the H coordinate
    emb = np.concatenate([emb_a, emb_b], axis=1)
    return emb.reshape(grid_size, grid_size, embed_dim).astype(np.float32)


def cropped_pos_embed(cfg: MMDiTConfig, gh: int, gw: int) -> np.ndarray:
    """Center-crop of the max-size grid to the [gh, gw] latent patch grid
    (PatchEmbed.cropped_pos_embed). base_size = 64 (sample_size 128 / p)."""
    m = cfg.pos_embed_max_size
    if gh > m or gw > m:
        raise ValueError(
            f"latent patch grid {gh}x{gw} exceeds pos_embed_max_size {m}"
        )
    grid = _pos_grid(cfg.hidden, m, 64)
    top = (m - gh) // 2
    left = (m - gw) // 2
    return grid[top:top + gh, left:left + gw].reshape(gh * gw, cfg.hidden)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rms_head(x, w, eps=1e-6):
    """Per-head RMS norm over the last (head_dim) axis, f32 island."""
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * r).astype(x.dtype) * w


def _split_heads(t, n_head):
    b, l, d = t.shape
    return t.reshape(b, l, n_head, d // n_head)


def _joint_attention(p, x, c, cfg: MMDiTConfig, pre_only: bool):
    """One joint self-attention over [x ⧺ c] tokens (latent first, the
    JointAttnProcessor concat order), per-stream projections.

    Accepts fused per-stream projections (fuse_mmdit_qkv): one [C, 3C]
    matmul per stream instead of three — column blocks of a matmul are
    independent, so outputs are identical while the MXU sees one large
    op."""
    n_head, hd = cfg.n_heads, cfg.head_dim
    if "qkv" in p:
        q, k, v = jnp.split(linear(p["qkv"], x), 3, axis=-1)
    else:
        q = linear(p["to_q"], x)
        k = linear(p["to_k"], x)
        v = linear(p["to_v"], x)
    if "add_qkv" in p:
        cq, ck, cv = jnp.split(linear(p["add_qkv"], c), 3, axis=-1)
    else:
        cq = linear(p["add_q_proj"], c)
        ck = linear(p["add_k_proj"], c)
        cv = linear(p["add_v_proj"], c)
    if cfg.qk_norm == "rms":
        q = _rms_head(_split_heads(q, n_head), p["norm_q"]["w"]).reshape(q.shape)
        k = _rms_head(_split_heads(k, n_head), p["norm_k"]["w"]).reshape(k.shape)
        cq = _rms_head(_split_heads(cq, n_head),
                       p["norm_added_q"]["w"]).reshape(cq.shape)
        ck = _rms_head(_split_heads(ck, n_head),
                       p["norm_added_k"]["w"]).reshape(ck.shape)
    lx = x.shape[1]
    qj = jnp.concatenate([q, cq], axis=1)
    kj = jnp.concatenate([k, ck], axis=1)
    vj = jnp.concatenate([v, cv], axis=1)
    att = qkv_attention(qj, kj, vj, None, n_head)
    ax, ac = att[:, :lx], att[:, lx:]
    out_x = linear(p["to_out"], ax)
    out_c = None if pre_only else linear(p["to_add_out"], ac)
    return out_x, out_c


def _ln_nomod(x, eps=1e-6):
    """LayerNorm without learned affine (f32 island)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _ada_zero(p, temb):
    """AdaLayerNormZero modulation: 6-way chunk, SHIFT first."""
    m = linear(p, jax.nn.silu(temb))
    return jnp.split(m, 6, axis=-1)


def _mlp(p, x):
    """FeedForward(activation_fn='gelu-approximate'), ratio 4."""
    return linear(p["out"], jax.nn.gelu(linear(p["in"], x), approximate=True))


def _self_attention(p, x, cfg: MMDiTConfig):
    """Plain latent-stream self-attention — SD3.5-medium's attn2."""
    n_head = cfg.n_heads
    if "qkv" in p:
        q, k, v = jnp.split(linear(p["qkv"], x), 3, axis=-1)
    else:
        q = linear(p["to_q"], x)
        k = linear(p["to_k"], x)
        v = linear(p["to_v"], x)
    if cfg.qk_norm == "rms":
        q = _rms_head(_split_heads(q, n_head), p["norm_q"]["w"]).reshape(q.shape)
        k = _rms_head(_split_heads(k, n_head), p["norm_k"]["w"]).reshape(k.shape)
    return linear(p["to_out"], qkv_attention(q, k, v, None, n_head))


def _joint_block(p, x, c, temb, cfg: MMDiTConfig, pre_only: bool,
                 dual: bool = False):
    if dual:
        # SD35AdaLayerNormZeroX: 9-way chunk — the joint attention's
        # shift/scale/gate, the MLP's, then the EXTRA self-attention's
        m = linear(p["norm1"]["mod"], jax.nn.silu(temb))
        (sh, sc, g, sh2, sc2, g2,
         sh_a2, sc_a2, g_a2) = jnp.split(m, 9, axis=-1)
        nx_a2 = _ln_nomod(x) * (1 + sc_a2[:, None]) + sh_a2[:, None]
    else:
        sh, sc, g, sh2, sc2, g2 = _ada_zero(p["norm1"]["mod"], temb)
    nx = _ln_nomod(x) * (1 + sc[:, None]) + sh[:, None]
    if pre_only:
        # AdaLayerNormContinuous: 2-way chunk, SCALE first
        m = linear(p["norm1_context"]["mod"], jax.nn.silu(temb))
        csc, csh = jnp.split(m, 2, axis=-1)
        nc = _ln_nomod(c) * (1 + csc[:, None]) + csh[:, None]
    else:
        c_sh, c_sc, c_g, c_sh2, c_sc2, c_g2 = _ada_zero(
            p["norm1_context"]["mod"], temb)
        nc = _ln_nomod(c) * (1 + c_sc[:, None]) + c_sh[:, None]

    ax, ac = _joint_attention(p["attn"], nx, nc, cfg, pre_only)
    x = x + g[:, None] * ax
    if dual:
        x = x + g_a2[:, None] * _self_attention(p["attn2"], nx_a2, cfg)
    nx2 = _ln_nomod(x) * (1 + sc2[:, None]) + sh2[:, None]
    x = x + g2[:, None] * _mlp(p["mlp"], nx2)
    if pre_only:
        return x, None
    c = c + c_g[:, None] * ac
    nc2 = _ln_nomod(c) * (1 + c_sc2[:, None]) + c_sh2[:, None]
    c = c + c_g2[:, None] * _mlp(p["mlp_context"], nc2)
    return x, c


def mmdit_forward(
    params,
    cfg: MMDiTConfig,
    x: jnp.ndarray,          # [B, h, w, in_channels] NHWC latent
    timesteps: jnp.ndarray,  # [B] (flow-matching: sigma*1000, continuous)
    context: jnp.ndarray,    # [B, T, joint_attention_dim] token stream
    pooled: jnp.ndarray,     # [B, pooled_projection_dim]
    skip_layers: tuple = (),
) -> jnp.ndarray:
    """Velocity prediction [B, h, w, out_channels].

    skip_layers omits the named transformer blocks entirely (both
    streams pass through unchanged) — the perturbed branch of SD3.5
    skip-layer guidance (diffusers SD3Transformer2DModel's skip_layers).
    """
    dtype = x.dtype
    b, h, w, _ = x.shape
    pN = cfg.patch_size
    gh, gw = h // pN, w // pN

    # patchify: conv(k=p, s=p) == reshape + linear over p*p*C blocks
    xp = x.reshape(b, gh, pN, gw, pN, cfg.in_channels)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw,
                                                pN * pN * cfg.in_channels)
    tokens = linear(params["pos_embed"]["proj"], xp)
    pos = jnp.asarray(cropped_pos_embed(cfg, gh, gw))
    tokens = tokens + pos[None].astype(dtype)

    # temb = MLP(t sinusoid) + MLP(pooled); the 256-wide sinusoid is the
    # diffusers Timesteps(256, flip_sin_to_cos=True, shift=0) — identical
    # math to the UNet's cos-first embedding (ops/embeddings.py)
    t_sin = timestep_embedding(timesteps, cfg.time_sinusoid_dim).astype(dtype)
    te = params["time_text_embed"]
    t_emb = linear(te["timestep_lin2"],
                   jax.nn.silu(linear(te["timestep_lin1"], t_sin)))
    p_emb = linear(te["text_lin2"],
                   jax.nn.silu(linear(te["text_lin1"],
                                      pooled.astype(dtype))))
    temb = t_emb + p_emb

    c = linear(params["context_embedder"], context.astype(dtype))

    n = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        if i in skip_layers:
            continue
        tokens, c = _joint_block(blk, tokens, c, temb, cfg, i == n - 1,
                                 dual=i in cfg.dual_attention_layers)

    # final AdaLayerNormContinuous (SCALE first) + projection
    m = linear(params["norm_out"]["mod"], jax.nn.silu(temb))
    sc, sh = jnp.split(m, 2, axis=-1)
    tokens = _ln_nomod(tokens) * (1 + sc[:, None]) + sh[:, None]
    out = linear(params["proj_out"], tokens)

    # unpatchify
    out = out.reshape(b, gh, gw, pN, pN, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
    return out


# ---------------------------------------------------------------------------
# init (tests / bring-up without real weights)
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype, scale=0.02):
    kw, = jax.random.split(key, 1)
    return {
        "w": jax.random.normal(kw, (d_in, d_out), dtype) * scale,
        "b": jnp.zeros((d_out,), dtype),
    }


def _init_block(key, cfg: MMDiTConfig, dtype, pre_only: bool,
                dual: bool = False):
    hdim = cfg.hidden
    ks = iter(jax.random.split(key, 22))
    attn = {
        "to_q": _dense(next(ks), hdim, hdim, dtype),
        "to_k": _dense(next(ks), hdim, hdim, dtype),
        "to_v": _dense(next(ks), hdim, hdim, dtype),
        "add_q_proj": _dense(next(ks), hdim, hdim, dtype),
        "add_k_proj": _dense(next(ks), hdim, hdim, dtype),
        "add_v_proj": _dense(next(ks), hdim, hdim, dtype),
        "to_out": _dense(next(ks), hdim, hdim, dtype),
    }
    if not pre_only:
        attn["to_add_out"] = _dense(next(ks), hdim, hdim, dtype)
    if cfg.qk_norm == "rms":
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            attn[nm] = {"w": jnp.ones((cfg.head_dim,), dtype)}
    p = {
        "norm1": {"mod": _dense(next(ks), hdim,
                                (9 if dual else 6) * hdim, dtype)},
        "norm1_context": {
            "mod": _dense(next(ks), hdim,
                          (2 if pre_only else 6) * hdim, dtype)
        },
        "attn": attn,
        "mlp": {
            "in": _dense(next(ks), hdim, 4 * hdim, dtype),
            "out": _dense(next(ks), 4 * hdim, hdim, dtype),
        },
    }
    if dual:
        attn2 = {
            "to_q": _dense(next(ks), hdim, hdim, dtype),
            "to_k": _dense(next(ks), hdim, hdim, dtype),
            "to_v": _dense(next(ks), hdim, hdim, dtype),
            "to_out": _dense(next(ks), hdim, hdim, dtype),
        }
        if cfg.qk_norm == "rms":
            for nm in ("norm_q", "norm_k"):
                attn2[nm] = {"w": jnp.ones((cfg.head_dim,), dtype)}
        p["attn2"] = attn2
    if not pre_only:
        p["mlp_context"] = {
            "in": _dense(next(ks), hdim, 4 * hdim, dtype),
            "out": _dense(next(ks), 4 * hdim, hdim, dtype),
        }
    return p


def init_mmdit(key, cfg: MMDiTConfig, dtype=jnp.float32):
    hdim = cfg.hidden
    ks = iter(jax.random.split(key, cfg.num_layers + 8))
    return {
        "pos_embed": {
            "proj": _dense(
                next(ks), cfg.patch_size**2 * cfg.in_channels, hdim, dtype
            )
        },
        "time_text_embed": {
            "timestep_lin1": _dense(next(ks), cfg.time_sinusoid_dim, hdim,
                                    dtype),
            "timestep_lin2": _dense(next(ks), hdim, hdim, dtype),
            "text_lin1": _dense(next(ks), cfg.pooled_projection_dim, hdim,
                                dtype),
            "text_lin2": _dense(next(ks), hdim, hdim, dtype),
        },
        "context_embedder": _dense(next(ks), cfg.joint_attention_dim, hdim,
                                   dtype),
        "blocks": [
            _init_block(next(ks), cfg, dtype, i == cfg.num_layers - 1,
                        dual=i in cfg.dual_attention_layers)
            for i in range(cfg.num_layers)
        ],
        "norm_out": {"mod": _dense(next(ks), hdim, 2 * hdim, dtype)},
        "proj_out": _dense(
            next(ks), hdim, cfg.patch_size**2 * cfg.out_channels, dtype
        ),
    }


def fuse_mmdit_qkv(params):
    """Fuse each block's per-stream q/k/v projections into one [C, 3C]
    matmul (+ fused bias): attn.to_q/to_k/to_v -> attn.qkv,
    attn.add_{q,k,v}_proj -> attn.add_qkv, attn2 likewise. Column blocks
    of a matmul are independent, so outputs are identical while the MXU
    runs one large dot per stream instead of three (same rationale as
    unet.fuse_unet_qkv). rms q/k norms are applied AFTER the split, so
    they carry over unchanged. Idempotent.

    Measured-and-NOT-defaulted: on v5e at sd3-medium shapes (T=4429,
    1536-wide) the fused step is within noise of the unfused one
    (6.69 vs 6.56 s e2e) — the per-stream matmuls are already large
    enough to saturate the MXU and the post-matmul split adds a layout
    op, unlike the UNet's skinny 320/640-wide self-attentions where
    fusion measurably won. Kept as an opt-in param prep."""

    def fuse3(p, names):
        key = "qkv" if names[0] == "to_q" else "add_qkv"
        if not isinstance(p, dict) or key in p or names[0] not in p:
            return p
        fused = dict(p)
        qp, kp, vp = (p[n] for n in names)
        fused[key] = {
            "w": jnp.concatenate([qp["w"], kp["w"], vp["w"]], axis=-1),
            "b": jnp.concatenate([qp["b"], kp["b"], vp["b"]], axis=-1),
        }
        for n in names:
            del fused[n]
        return fused

    out = dict(params)
    blocks = []
    for blk in params["blocks"]:
        blk = dict(blk)
        attn = fuse3(blk["attn"], ("to_q", "to_k", "to_v"))
        attn = fuse3(attn, ("add_q_proj", "add_k_proj", "add_v_proj"))
        blk["attn"] = attn
        if "attn2" in blk:
            blk["attn2"] = fuse3(blk["attn2"], ("to_q", "to_k", "to_v"))
        blocks.append(blk)
    out["blocks"] = blocks
    return out
