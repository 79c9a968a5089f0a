"""SDXL diffusion UNet (base + refiner) in NHWC.

Reimplements /root/reference/src/model/unet/mod.rs as a config-driven block
plan + pure forward function:

  - timestep sinusoid embedding, cos-first (unet/mod.rs:21-39)
  - time/label 2-layer SiLU MLPs (unet/mod.rs:80-88, 458-468)
  - block plan generator (unet/mod.rs:115-173 input, 238-248 middle,
    250-328 output): transformers only at levels 1 and 2, downsample =
    stride-2 3x3 conv, upsample = nearest-2x + 3x3 conv, skip-cat U-Net
    topology (unet/mod.rs:470-491)
  - ResBlock: GN -> SiLU -> conv + time-emb inject -> GN -> SiLU -> conv
    (+1x1 skip) (unet/mod.rs:1082-1106)
  - SpatialTransformer: GN -> flatten HW -> linear proj_in -> N pre-LN
    transformer blocks (self-attn, cross-attn vs 77x2048 context, GEGLU
    MLP) -> proj_out + residual (unet/mod.rs:820-891)

The same generator covers the refiner (4 levels, model_channels=384,
depth-4 transformers, context 1280, resnet_upsample at the deepest level),
matching the reference's config-driven construction.

Runs in bf16 on the MXU (reference uses f16; bf16 is the TPU-native
half precision with the same f32 softmax/norm islands).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..configs import UNetConfig
from ..ops.attention import qkv_attention
from ..ops.conv import (
    conv1x1,
    conv2d,
    fold_upsample_conv,
    upsample2x_conv,
    upsample_nearest_2x,
)
from ..ops.embeddings import timestep_embedding
from ..ops.linear import linear, linear_nobias
from ..ops.norms import groupnorm_nhwc, layernorm_affine


# ---------------------------------------------------------------------------
# Block plan (static; mirrors UNetConfig::init, unet/mod.rs:71-430)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BlockSpec:
    kind: str  # conv | res | down | res_t | res_t_up | res_up
    ch_in: int = 0
    ch_out: int = 0
    n_head: int = 0
    depth: int = 0


@functools.lru_cache(maxsize=None)
def unet_block_plan(cfg: UNetConfig) -> Tuple[Tuple[BlockSpec, ...], BlockSpec, Tuple[BlockSpec, ...]]:
    mc = cfg.model_channels
    mults = cfg.channel_mults
    n_levels = len(mults)
    t_levels = cfg.transformer_levels
    # SDXL derives heads from a fixed head width (unet/mod.rs:113);
    # SD 1.x fixes the head COUNT at 8 across widths
    heads = lambda ch: cfg.n_heads or ch // cfg.n_head_channels  # noqa: E731

    inputs: List[BlockSpec] = [BlockSpec("conv", cfg.in_channels, mc)]
    for level in range(n_levels):
        ch_in = mults[max(level - 1, 0)] * mc
        ch_out = mults[level] * mc
        if level not in t_levels:
            inputs.append(BlockSpec("res", ch_in, ch_out))
            inputs.append(BlockSpec("res", ch_out, ch_out))
        else:
            d = cfg.transformer_depths[level]
            inputs.append(BlockSpec("res_t", ch_in, ch_out, heads(ch_out), d))
            inputs.append(BlockSpec("res_t", ch_out, ch_out, heads(ch_out), d))
        if level != n_levels - 1:
            inputs.append(BlockSpec("down", ch_out, ch_out))

    ch_mid = mults[-1] * mc
    middle = BlockSpec(
        "res_t_res", ch_mid, ch_mid, heads(ch_mid), cfg.transformer_depths[-1]
    )

    outputs: List[BlockSpec] = []
    for level in reversed(range(n_levels)):
        next_level = level + 1 if level != n_levels - 1 else level
        ch_out = mults[level] * mc
        ch_in1 = mults[next_level] * mc + ch_out
        ch_in2 = 2 * ch_out
        ch_in3 = ch_out + mults[max(level - 1, 0)] * mc
        if level not in t_levels:
            outputs.append(BlockSpec("res", ch_in1, ch_out))
            outputs.append(BlockSpec("res", ch_in2, ch_out))
            kind3 = "res_up" if level != 0 else "res"
            outputs.append(BlockSpec(kind3, ch_in3, ch_out))
        else:
            d = cfg.transformer_depths[level]
            h = heads(ch_out)
            outputs.append(BlockSpec("res_t", ch_in1, ch_out, h, d))
            outputs.append(BlockSpec("res_t", ch_in2, ch_out, h, d))
            kind3 = "res_t_up" if level != 0 else "res_t"
            outputs.append(BlockSpec(kind3, ch_in3, ch_out, h, d))

    return tuple(inputs), middle, tuple(outputs)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def _res_block(p, x, emb):
    """ResBlock::forward (unet/mod.rs:1083-1105); emb injected per channel."""
    h = conv2d(p["conv_in"], silu(groupnorm_nhwc(x, **p["norm_in"])))
    emb_out = linear(p["lin_embed"], silu(emb)).astype(h.dtype)
    h = h + emb_out[:, None, None, :]
    h = conv2d(p["conv_out"], silu(groupnorm_nhwc(h, **p["norm_out"])))
    if "skip" in p:
        x = conv1x1(p["skip"], x)
    return x + h


def _geglu_mlp(p, x):
    """GEGLU MLP (unet/mod.rs:916-955): proj -> split -> x * gelu(gate)."""
    projected = linear(p["proj"], x)
    a, gate = jnp.split(projected, 2, axis=-1)
    return linear(p["lin"], a * jax.nn.gelu(gate, approximate=False))


def _mha(p, x, context, n_head, kv=None):
    """MultiHeadAttention (unet/mod.rs:1005-1023): no-bias qkv, bias out.

    kv: optional precomputed (k, v) — the cross-attention projections of a
    loop-invariant context (see precompute_cross_kv).

    Self-attention accepts a fused "qkv" weight (fuse_unet_qkv): one
    [C, 3C] matmul instead of three [C, C] — column blocks of a matmul are
    independent, so outputs are identical while the MXU sees one large op.
    """
    if "qkv" in p and context is None and kv is None:
        qkv = linear_nobias(p["qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear_nobias(p["q"], x)
        if kv is not None:
            k, v = kv["k"], kv["v"]
        else:
            ctx = x if context is None else context
            k = linear_nobias(p["k"], ctx)
            v = linear_nobias(p["v"], ctx)
    att = qkv_attention(q, k, v, None, n_head)
    if kv is not None and "ip_k" in kv:
        # IP-Adapter decoupled cross-attention (models/ip_adapter.py):
        # extra attention over the image tokens, summed before the output
        # projection; the ip scale is pre-folded into ip_v
        att = att + qkv_attention(q, kv["ip_k"], kv["ip_v"], None, n_head)
    return linear(p["out"], att)


def _mha_identity(p, x):
    """PAG perturbed self-attention (Ahn et al. 2024, arXiv:2403.17377):
    the softmax map is replaced by the identity matrix, so every token
    attends only to itself — the output is just the V projection (Q/K
    are skipped entirely; with the identity map they are unused)."""
    if "qkv" in p:
        qkv = linear_nobias(p["qkv"], x)
        _, _, v = jnp.split(qkv, 3, axis=-1)
    else:
        v = linear_nobias(p["v"], x)
    return linear(p["out"], v)


def _transformer_block(p, x, context, n_head, kv=None, identity_self=False):
    if identity_self:
        x = x + _mha_identity(p["attn1"], layernorm_affine(x, **p["norm1"]))
    else:
        x = x + _mha(p["attn1"], layernorm_affine(x, **p["norm1"]), None,
                     n_head)
    x = x + _mha(p["attn2"], layernorm_affine(x, **p["norm2"]), context, n_head,
                 kv=kv)
    return x + _geglu_mlp(p["mlp"], layernorm_affine(x, **p["norm3"]))


def _spatial_transformer(p, x, context, n_head, kv=None,
                         identity_self=False):
    """SpatialTransformer (unet/mod.rs:820-845) over NHWC.

    `blocks` is either a list of per-block pytrees (unrolled at trace time)
    or one stacked pytree with a leading depth axis (see
    stack_unet_transformers), in which case the stack runs as a lax.scan —
    the depth-10 stacks then trace/compile one body instead of ten.

    identity_self=True perturbs every block's SELF-attention to the
    identity map (PAG, see _mha_identity); cross-attention and MLPs are
    untouched.
    """
    b, h, w, c = x.shape
    x_in = x
    y = groupnorm_nhwc(x, **p["norm"])
    y = y.reshape(b, h * w, c)
    y = linear(p["proj_in"], y)
    blocks = p["blocks"]
    if isinstance(blocks, dict):
        if kv is not None:
            def body(carry, inp):
                blk, kv_d = inp
                return _transformer_block(blk, carry, context, n_head, kv_d,
                                          identity_self), None

            y, _ = jax.lax.scan(body, y, (blocks, kv))
        else:
            def body(carry, blk):
                return _transformer_block(blk, carry, context, n_head,
                                          identity_self=identity_self), None

            y, _ = jax.lax.scan(body, y, blocks)
    else:
        for i, bp in enumerate(blocks):
            y = _transformer_block(
                bp, y, context, n_head, kv[i] if kv is not None else None,
                identity_self=identity_self,
            )
    y = linear(p["proj_out"], y).reshape(b, h, w, c)
    return x_in + y


def _apply_block(spec: BlockSpec, p, x, emb, context, kv=None):
    if spec.kind == "conv":
        return conv2d(p["conv"], x)
    if spec.kind == "res":
        return _res_block(p["res"], x, emb)
    if spec.kind == "down":
        return conv2d(p["conv"], x, stride=2)
    if spec.kind == "res_t":
        x = _res_block(p["res"], x, emb)
        return _spatial_transformer(p["transformer"], x, context, spec.n_head, kv)
    if spec.kind == "res_t_up":
        x = _res_block(p["res"], x, emb)
        x = _spatial_transformer(p["transformer"], x, context, spec.n_head, kv)
        return upsample2x_conv(p["upsample"], x)
    if spec.kind == "res_up":
        x = _res_block(p["res"], x, emb)
        return upsample2x_conv(p["upsample"], x)
    raise ValueError(f"unknown block kind {spec.kind}")


def unet_forward(
    params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    label: jnp.ndarray,
    cross_kv=None,
    control_residuals=None,
    t_add=None,
    pag_mid: bool = False,
) -> jnp.ndarray:
    """UNet::forward (unet/mod.rs:449-493). x: [B,h,w,4] NHWC latent.

    pag_mid=True runs the MIDDLE block's self-attentions as identity
    maps — the PAG perturbed branch (arXiv:2403.17377; the "mid" layer
    set, diffusers' default pag_applied_layers).

    cross_kv: optional precompute_cross_kv() output. The sampler's context
    is constant across the whole denoising scan, so every cross-attention
    K/V projection is loop-invariant; passing them in removes ~120 skinny
    (77-row) matmuls from each of the 31 scan steps.

    control_residuals: optional (down_residuals, mid_residual) from
    models/controlnet.py::controlnet_forward — down residuals are added to
    the saved skip connections (one per input block), the mid residual to
    the middle-block output; the trunk input itself is untouched (public
    ControlNet semantics)."""
    dtype = x.dtype
    # SD 1.x/2.x (adm_in_channels == 0): timestep conditioning only
    emb = _unet_embed(params, cfg, timesteps, label, dtype, t_add)
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    ckv = cross_kv or {}

    saved = []
    for i, (spec, p) in enumerate(zip(in_plan, params["input_blocks"])):
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("input_blocks", {}).get(i))
        saved.append(x)

    if control_residuals is not None:
        down_res, mid_res = control_residuals
        saved = [s + r.astype(s.dtype) for s, r in zip(saved, down_res)]

    mp = params["middle_block"]
    x = _res_block(mp["res1"], x, emb)
    x = _spatial_transformer(mp["transformer"], x, context, mid_spec.n_head,
                             ckv.get("middle_block"),
                             identity_self=pag_mid)
    x = _res_block(mp["res2"], x, emb)
    if control_residuals is not None:
        x = x + mid_res.astype(x.dtype)

    for i, (spec, p) in enumerate(zip(out_plan, params["output_blocks"])):
        skip = saved.pop()
        if cfg.freeu is not None and i // 3 <= 1:
            # FreeU (arXiv:2309.11497; diffusers apply_freeu): at the two
            # deepest decoder levels boost the backbone's first half
            # channels by b and attenuate the skip's low spatial
            # frequencies by s. Three skip-cats per level -> level = i//3.
            b1, b2, s1, s2 = cfg.freeu
            b, s = (b1, s1) if i // 3 == 0 else (b2, s2)
            half = x.shape[-1] // 2
            x = jnp.concatenate([x[..., :half] * b, x[..., half:]], axis=-1)
            skip = freeu_fourier_filter(skip, 1, s)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("output_blocks", {}).get(i))

    x = silu(groupnorm_nhwc(x, **params["norm_out"]))
    return conv2d(params["conv_out"], x)


def freeu_fourier_filter(x: jnp.ndarray, threshold: int,
                         scale: float) -> jnp.ndarray:
    """FreeU's fourier_filter (official impl / diffusers
    fourier_filter): FFT over the spatial dims, scale the centered
    2*threshold-wide low-frequency box by `scale`, inverse FFT. x is
    NHWC; computed in f32 (complex FFT), cast back to x.dtype."""
    _, h, w, _ = x.shape
    xf = jnp.fft.fftshift(
        jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2)), axes=(1, 2)
    )
    row = jnp.arange(h)
    col = jnp.arange(w)
    in_row = (row >= h // 2 - threshold) & (row < h // 2 + threshold)
    in_col = (col >= w // 2 - threshold) & (col < w // 2 + threshold)
    mask = jnp.where(in_row[:, None] & in_col[None, :],
                     jnp.float32(scale), jnp.float32(1.0))
    xf = xf * mask[None, :, :, None]
    out = jnp.fft.ifft2(jnp.fft.ifftshift(xf, axes=(1, 2)), axes=(1, 2)).real
    return out.astype(x.dtype)


def _unet_embed(params, cfg: UNetConfig, timesteps, label, dtype,
                t_add=None):
    """Shared timestep (+ label) embedding for the full and DeepCache
    forward variants.

    t_add [1 or B, model_channels]: optional addend to the raw timestep
    sinusoid BEFORE the time-embed MLP — diffusers' TimestepEmbedding
    cond_proj slot, used by LCM-distilled UNets for the guidance-scale
    embedding (models with time_cond_proj_dim; the caller applies the
    cond_proj linear once since the addend is scan-invariant)."""
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(dtype)
    if t_add is not None:
        t_emb = t_emb + t_add.astype(dtype)
    t_emb = linear(params["time_embed"]["lin2"],
                   silu(linear(params["time_embed"]["lin1"], t_emb)))
    if cfg.adm_in_channels:
        label_emb = linear(
            params["label_embed"]["lin2"],
            silu(linear(params["label_embed"]["lin1"], label.astype(dtype))),
        )
        return t_emb + label_emb
    return t_emb


def unet_forward_cached(params, cfg: UNetConfig, x, timesteps, context,
                        label, cross_kv=None, branch: int = 3):
    """Full UNet forward that ALSO returns the DeepCache feature
    (arXiv:2312.00858): the hidden state entering output block
    O - branch — i.e. the deep U that a shallow step can reuse.

    `branch` counts the INPUT blocks a shallow step recomputes (the
    shallow prefix); output block O - branch is the first one a shallow
    step runs, and it consumes skip `branch - 1`, so the cache must be
    its pre-concat input (the output of output block O - branch - 1).
    Identical math to unet_forward otherwise (same cross_kv layout; no
    FreeU interaction below the split — FreeU lives in the deep levels a
    shallow step skips)."""
    dtype = x.dtype
    emb = _unet_embed(params, cfg, timesteps, label, dtype)
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    ckv = cross_kv or {}
    n_out = len(out_plan)
    if not 1 <= branch <= n_out - 1:
        raise ValueError(f"deepcache branch must be in [1, {n_out - 1}]")

    saved = []
    for i, (spec, p) in enumerate(zip(in_plan, params["input_blocks"])):
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("input_blocks", {}).get(i))
        saved.append(x)

    mp = params["middle_block"]
    x = _res_block(mp["res1"], x, emb)
    x = _spatial_transformer(mp["transformer"], x, context, mid_spec.n_head,
                             ckv.get("middle_block"))
    x = _res_block(mp["res2"], x, emb)

    cache = None
    for i, (spec, p) in enumerate(zip(out_plan, params["output_blocks"])):
        if i == n_out - branch:
            cache = x
        skip = saved.pop()
        if cfg.freeu is not None and i // 3 <= 1:
            b1, b2, s1, s2 = cfg.freeu
            b, s = (b1, s1) if i // 3 == 0 else (b2, s2)
            half = x.shape[-1] // 2
            x = jnp.concatenate([x[..., :half] * b, x[..., half:]], axis=-1)
            skip = freeu_fourier_filter(skip, 1, s)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("output_blocks", {}).get(i))

    x = silu(groupnorm_nhwc(x, **params["norm_out"]))
    return conv2d(params["conv_out"], x), cache


def unet_forward_shallow(params, cfg: UNetConfig, x, timesteps, context,
                         label, cache, cross_kv=None, branch: int = 3):
    """DeepCache shallow step: recompute only the first `branch` input
    blocks (fresh skips for the shallow decoder tail) and the last
    `branch` output blocks, splicing in the `cache` feature from the
    last full step in place of the deep U. The deep transformers — the
    bulk of the step — are skipped entirely."""
    dtype = x.dtype
    emb = _unet_embed(params, cfg, timesteps, label, dtype)
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    ckv = cross_kv or {}
    n_out = len(out_plan)

    saved = []
    for i, (spec, p) in enumerate(
        zip(in_plan[:branch], params["input_blocks"][:branch])
    ):
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("input_blocks", {}).get(i))
        saved.append(x)

    x = cache
    for i in range(n_out - branch, n_out):
        spec, p = out_plan[i], params["output_blocks"][i]
        skip = saved.pop()
        if cfg.freeu is not None and i // 3 <= 1:
            b1, b2, s1, s2 = cfg.freeu
            b, s = (b1, s1) if i // 3 == 0 else (b2, s2)
            half = x.shape[-1] // 2
            x = jnp.concatenate([x[..., :half] * b, x[..., half:]], axis=-1)
            skip = freeu_fourier_filter(skip, 1, s)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("output_blocks", {}).get(i))

    x = silu(groupnorm_nhwc(x, **params["norm_out"]))
    return conv2d(params["conv_out"], x)


def precompute_cross_kv(params, cfg: UNetConfig, context: jnp.ndarray):
    """Cross-attention K/V projections of a fixed context, for every
    SpatialTransformer block (loop-invariant across the sampler scan).

    Returns {"input_blocks": {i: st_kv}, "middle_block": st_kv,
    "output_blocks": {i: st_kv}} where st_kv is a list of per-depth
    {"k","v"} dicts, or a stacked pytree when the transformer stack is
    stacked (stack_unet_transformers)."""

    def block_kv(bp):
        return {
            "k": linear_nobias(bp["attn2"]["k"], context),
            "v": linear_nobias(bp["attn2"]["v"], context),
        }

    def st_kv(st):
        blocks = st["blocks"]
        if isinstance(blocks, dict):  # stacked: [depth, ...] weight axes
            return jax.vmap(
                lambda bp: block_kv(bp), in_axes=(0,), out_axes=0
            )(blocks)
        return [block_kv(bp) for bp in blocks]

    in_plan, _, out_plan = unet_block_plan(cfg)
    out = {"input_blocks": {}, "output_blocks": {}}
    for i, (spec, p) in enumerate(zip(in_plan, params["input_blocks"])):
        if spec.kind in ("res_t", "res_t_up"):
            out["input_blocks"][i] = st_kv(p["transformer"])
    out["middle_block"] = st_kv(params["middle_block"]["transformer"])
    for i, (spec, p) in enumerate(zip(out_plan, params["output_blocks"])):
        if spec.kind in ("res_t", "res_t_up"):
            out["output_blocks"][i] = st_kv(p["transformer"])
    return out


def fuse_unet_qkv(params):
    """Fuse every self-attention's q/k/v weights into one [C, 3C] matrix.

    Column blocks of a matmul are computed independently (same contraction
    order), so outputs match the three separate projections; the MXU runs
    one large dot instead of three launches per transformer block.
    Cross-attention (attn2) keeps separate k/v — those are precomputed per
    scan via precompute_cross_kv. Works on plain lists and on stacked
    (leading-depth-axis) blocks; idempotent.

    Also phase-decomposes every upsample conv (fold_upsample_conv): the
    production param-prep step for the whole UNet tree.
    """

    def fuse_block(bp):
        a1 = bp.get("attn1")
        if not isinstance(a1, dict) or "qkv" in a1 or "q" not in a1:
            return bp
        bp = dict(bp)
        bp["attn1"] = {
            "qkv": {
                "w": jnp.concatenate(
                    [a1["q"]["w"], a1["k"]["w"], a1["v"]["w"]], axis=-1
                )
            },
            "out": a1["out"],
        }
        return bp

    def walk(node):
        if isinstance(node, dict):
            if "attn1" in node and "attn2" in node:
                return fuse_block(node)
            out = {k: walk(v) for k, v in node.items()}
            # phase-decompose upsample convs while we're here (exact
            # regrouping of conv3x3(nearest2x(.)), ops/conv.py)
            if "upsample" in out and isinstance(out["upsample"], dict) \
                    and "w" in out["upsample"]:
                out["upsample"] = fold_upsample_conv(out["upsample"])
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def unfuse_unet_qkv(params):
    """Inverse of fuse_unet_qkv's attention fuse: split every fused
    self-attention ``qkv`` [C, 3C] back into separate q/k/v projections.

    Column blocks of a matmul are independent, so the split is exact.
    Used by the training path (train/finetune.py): LoRA factors target
    the UNFUSED projections so trained adapters export under the
    standard ecosystem names. Idempotent; does not undo the upsample
    phase decomposition (training never targets those convs)."""

    def unfuse_block(bp):
        a1 = bp.get("attn1")
        if not isinstance(a1, dict) or "qkv" not in a1:
            return bp
        w = a1["qkv"]["w"]
        c = w.shape[-1] // 3
        bp = dict(bp)
        bp["attn1"] = {
            "q": {"w": w[..., :c]},
            "k": {"w": w[..., c:2 * c]},
            "v": {"w": w[..., 2 * c:]},
            "out": a1["out"],
        }
        return bp

    def walk(node):
        if isinstance(node, dict):
            if "attn1" in node and "attn2" in node:
                return unfuse_block(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def unfold_unet_upsample(params):
    """Undo the upsample phase decomposition tree-wide: every 'w4' phase
    kernel back to the canonical 3x3 'w' (ops/conv.py
    unfold_upsample_conv — an exact inverse on consistent kernels).

    Required by FULL fine-tuning (train/full.py): training the w4 form
    would optimize over its 16 unconstrained taps — a strictly larger
    function class than 3x3 convs — making the result inexpressible in
    any standard checkpoint. Unfolding first keeps the trained model a
    true UNet; the forward transparently takes the reference
    nearest-2x + conv path for 'w' kernels (ops/conv.py
    upsample2x_conv)."""
    from ..ops.conv import unfold_upsample_conv

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if "upsample" in out and isinstance(out["upsample"], dict):
                out["upsample"] = unfold_upsample_conv(out["upsample"])
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# Transformer stacking (compile-time optimization)
# ---------------------------------------------------------------------------

def stack_unet_transformers(params, min_depth: int = 4):
    """Stack each SpatialTransformer's block list into one pytree with a
    leading depth axis so the forward scans instead of unrolling.

    Only stacks where depth >= min_depth (shallow stacks fuse better
    unrolled). Idempotent; loaders produce lists, pipelines call this once
    after load.
    """

    def stack_st(st):
        blocks = st.get("blocks")
        if isinstance(blocks, list) and len(blocks) >= min_depth:
            st = dict(st)
            st["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        return st

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "transformer" and isinstance(v, dict) and "blocks" in v:
                    out[k] = stack_st(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def _dense(key, d_in, d_out, dtype, scale=0.02, bias=True):
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * scale}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _conv(key, kh, kw, cin, cout, dtype, scale=0.02):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * scale,
        "b": jnp.zeros((cout,), dtype),
    }


def _gn(c, dtype):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _ln(c, dtype):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _init_res(key, cin, cout, emb_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm_in": _gn(cin, dtype),
        "conv_in": _conv(ks[0], 3, 3, cin, cout, dtype),
        "lin_embed": _dense(ks[1], emb_dim, cout, dtype),
        "norm_out": _gn(cout, dtype),
        "conv_out": _conv(ks[2], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["skip"] = _conv(ks[3], 1, 1, cin, cout, dtype)
    return p


def _init_transformer_block(key, c, ctx_dim, dtype):
    ks = jax.random.split(key, 10)
    attn = lambda k0, k1, k2, k3, kv_dim: {  # noqa: E731
        "q": _dense(k0, c, c, dtype, bias=False),
        "k": _dense(k1, kv_dim, c, dtype, bias=False),
        "v": _dense(k2, kv_dim, c, dtype, bias=False),
        "out": _dense(k3, c, c, dtype),
    }
    return {
        "norm1": _ln(c, dtype),
        "attn1": attn(ks[0], ks[1], ks[2], ks[3], c),
        "norm2": _ln(c, dtype),
        "attn2": attn(ks[4], ks[5], ks[6], ks[7], ctx_dim),
        "norm3": _ln(c, dtype),
        "mlp": {
            "proj": _dense(ks[8], c, 8 * c, dtype),
            "lin": _dense(ks[9], 4 * c, c, dtype),
        },
    }


def _init_spatial_transformer(key, c, ctx_dim, depth, dtype):
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": _gn(c, dtype),
        "proj_in": _dense(ks[0], c, c, dtype),
        "blocks": [
            _init_transformer_block(ks[i + 1], c, ctx_dim, dtype)
            for i in range(depth)
        ],
        "proj_out": _dense(ks[-1], c, c, dtype),
    }


def _init_block(key, spec: BlockSpec, cfg: UNetConfig, dtype):
    ks = jax.random.split(key, 3)
    emb_dim = cfg.time_embed_dim
    if spec.kind == "conv":
        return {"conv": _conv(ks[0], 3, 3, spec.ch_in, spec.ch_out, dtype)}
    if spec.kind == "down":
        return {"conv": _conv(ks[0], 3, 3, spec.ch_in, spec.ch_out, dtype)}
    if spec.kind == "res":
        return {"res": _init_res(ks[0], spec.ch_in, spec.ch_out, emb_dim, dtype)}
    if spec.kind == "res_up":
        return {
            "res": _init_res(ks[0], spec.ch_in, spec.ch_out, emb_dim, dtype),
            "upsample": _conv(ks[1], 3, 3, spec.ch_out, spec.ch_out, dtype),
        }
    if spec.kind == "res_t":
        return {
            "res": _init_res(ks[0], spec.ch_in, spec.ch_out, emb_dim, dtype),
            "transformer": _init_spatial_transformer(
                ks[1], spec.ch_out, cfg.context_dim, spec.depth, dtype
            ),
        }
    if spec.kind == "res_t_up":
        return {
            "res": _init_res(ks[0], spec.ch_in, spec.ch_out, emb_dim, dtype),
            "transformer": _init_spatial_transformer(
                ks[1], spec.ch_out, cfg.context_dim, spec.depth, dtype
            ),
            "upsample": _conv(ks[2], 3, 3, spec.ch_out, spec.ch_out, dtype),
        }
    raise ValueError(spec.kind)


def init_unet(key, cfg: UNetConfig, dtype=jnp.bfloat16):
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    n = len(in_plan) + len(out_plan) + 8
    keys = jax.random.split(key, n)
    ki = iter(keys)

    emb_dim = cfg.time_embed_dim
    mc = cfg.model_channels

    time_embed = {
        "lin1": _dense(next(ki), mc, emb_dim, dtype),
        "lin2": _dense(next(ki), emb_dim, emb_dim, dtype),
    }
    if cfg.time_cond_proj_dim:
        # keyed off a fold of the base key so pre-existing inits (no
        # cond_proj) stay bit-identical to their pinned goldens
        time_embed["cond_proj"] = _dense(
            jax.random.fold_in(key, 7001), cfg.time_cond_proj_dim, mc,
            dtype, bias=False,
        )
    # label keys are drawn at their historical position so SDXL inits stay
    # bit-identical to the pinned goldens even though SD 1.x skips them
    label_keys = (next(ki), next(ki))
    params = {
        "time_embed": time_embed,
        "input_blocks": [
            _init_block(next(ki), spec, cfg, dtype) for spec in in_plan
        ],
        "middle_block": {
            "res1": _init_res(next(ki), mid_spec.ch_in, mid_spec.ch_out, emb_dim, dtype),
            "transformer": _init_spatial_transformer(
                next(ki), mid_spec.ch_out, cfg.context_dim, mid_spec.depth, dtype
            ),
            "res2": _init_res(next(ki), mid_spec.ch_in, mid_spec.ch_out, emb_dim, dtype),
        },
        "norm_out": _gn(mc, dtype),
        "conv_out": _conv(next(ki), 3, 3, mc, cfg.out_channels, dtype),
        "output_blocks": [
            _init_block(next(ki), spec, cfg, dtype) for spec in out_plan
        ],
    }
    if cfg.adm_in_channels:
        params["label_embed"] = {
            "lin1": _dense(label_keys[0], cfg.adm_in_channels, emb_dim, dtype),
            "lin2": _dense(label_keys[1], emb_dim, emb_dim, dtype),
        }
    return params
