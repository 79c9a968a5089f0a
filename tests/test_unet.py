"""UNet block-plan and full-forward parity tests.

The block plan is checked against the reference's documented SDXL base and
refiner layouts (SURVEY.md §2; unet/mod.rs:92-111, python/unet.py:127-270).
The tiny-UNet forward is re-executed functionally in PyTorch from the same
weights, validating the full wiring (skip-cat LIFO, emb injection,
transformer placement) against torch ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sdxl_tpu.configs import (
    SDXL_BASE_DIFFUSER,
    SDXL_REFINER_DIFFUSER,
    UNetConfig,
)
from sdxl_tpu.models.unet import init_unet, unet_block_plan, unet_forward

TINY = UNetConfig(
    adm_in_channels=24,
    in_channels=4,
    out_channels=4,
    model_channels=32,
    channel_mults=(1, 2, 4),
    n_head_channels=8,
    transformer_depths=(1, 1, 2),
    context_dim=16,
)


def test_base_plan_matches_reference():
    inp, mid, out = unet_block_plan(SDXL_BASE_DIFFUSER.unet_config())
    assert len(inp) == 9 and len(out) == 9
    kinds_in = [b.kind for b in inp]
    assert kinds_in == [
        "conv", "res", "res", "down",
        "res_t", "res_t", "down",
        "res_t", "res_t",
    ]
    # transformer depths 2 at level 1 (640ch), 10 at level 2 (1280ch)
    assert inp[4].depth == 2 and inp[4].ch_out == 640 and inp[4].n_head == 10
    assert inp[7].depth == 10 and inp[7].ch_out == 1280 and inp[7].n_head == 20
    assert mid.ch_out == 1280 and mid.depth == 10

    kinds_out = [b.kind for b in out]
    assert kinds_out == [
        "res_t", "res_t", "res_t_up",
        "res_t", "res_t", "res_t_up",
        "res", "res", "res",
    ]
    # skip-cat input channels (comment block unet/mod.rs:330-391)
    assert [b.ch_in for b in out] == [
        2560, 2560, 1920, 1920, 1280, 960, 960, 640, 640
    ]


def test_refiner_plan_matches_reference():
    inp, mid, out = unet_block_plan(SDXL_REFINER_DIFFUSER.unet_config())
    assert len(inp) == 12 and len(out) == 12  # python/unet.py:163-270
    kinds_in = [b.kind for b in inp]
    assert kinds_in == [
        "conv", "res", "res", "down",
        "res_t", "res_t", "down",
        "res_t", "res_t", "down",
        "res", "res",
    ]
    kinds_out = [b.kind for b in out]
    # deepest level (3) uses plain res blocks with a resnet_upsample
    assert kinds_out[:3] == ["res", "res", "res_up"]
    assert kinds_out[3:6] == ["res_t", "res_t", "res_t_up"]
    assert mid.ch_out == 4 * 384


# ---------------------------------------------------------------------------
# torch functional mirror
# ---------------------------------------------------------------------------

def tt(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def t_conv(p, x, stride=1, padding=1):
    w = tt(p["w"]).permute(3, 2, 0, 1)
    return F.conv2d(x, w, tt(p["b"]), stride=stride, padding=padding)


def t_lin(p, x):
    y = x @ tt(p["w"])
    if "b" in p:
        y = y + tt(p["b"])
    return y


def t_gn(p, x):
    return F.group_norm(x, 32, tt(p["gamma"]), tt(p["beta"]))


def t_ln(p, x):
    return F.layer_norm(x, (x.shape[-1],), tt(p["gamma"]), tt(p["beta"]))


def t_res(p, x, emb):
    h = t_conv(p["conv_in"], F.silu(t_gn(p["norm_in"], x)))
    h = h + t_lin(p["lin_embed"], F.silu(emb))[:, :, None, None]
    h = t_conv(p["conv_out"], F.silu(t_gn(p["norm_out"], h)))
    if "skip" in p:
        x = t_conv(p["skip"], x, padding=0)
    return x + h


def t_attn(p, x, ctx, n_head):
    ctx = x if ctx is None else ctx
    q, k, v = t_lin(p["q"], x), t_lin(p["k"], ctx), t_lin(p["v"], ctx)
    b, tq, c = q.shape
    d = c // n_head
    q = q.reshape(b, tq, n_head, d).transpose(1, 2)
    k = k.reshape(b, -1, n_head, d).transpose(1, 2)
    v = v.reshape(b, -1, n_head, d).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, tq, c)
    return t_lin(p["out"], o)


def t_tblock(p, x, ctx, n_head):
    x = x + t_attn(p["attn1"], t_ln(p["norm1"], x), None, n_head)
    x = x + t_attn(p["attn2"], t_ln(p["norm2"], x), ctx, n_head)
    h = t_lin(p["mlp"]["proj"], t_ln(p["norm3"], x))
    a, gate = h.chunk(2, dim=-1)
    return x + t_lin(p["mlp"]["lin"], a * F.gelu(gate))


def t_spatial(p, x, ctx, n_head):
    b, c, hh, ww = x.shape
    y = t_gn(p["norm"], x).reshape(b, c, hh * ww).transpose(1, 2)
    y = t_lin(p["proj_in"], y)
    for bp in p["blocks"]:
        y = t_tblock(bp, y, ctx, n_head)
    y = t_lin(p["proj_out"], y).transpose(1, 2).reshape(b, c, hh, ww)
    return x + y


def t_block(spec, p, x, emb, ctx):
    if spec.kind == "conv":
        return t_conv(p["conv"], x)
    if spec.kind == "down":
        return t_conv(p["conv"], x, stride=2)
    if spec.kind == "res":
        return t_res(p["res"], x, emb)
    x = t_res(p["res"], x, emb)
    if spec.kind in ("res_t", "res_t_up"):
        x = t_spatial(p["transformer"], x, ctx, spec.n_head)
    if spec.kind in ("res_up", "res_t_up"):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = t_conv(p["upsample"], x)
    return x


def t_unet(params, cfg, x, t, ctx, label):
    half = cfg.model_channels // 2
    freqs = torch.exp(
        -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    t_emb = torch.cat([torch.cos(args), torch.sin(args)], dim=1)
    t_emb = t_lin(params["time_embed"]["lin2"], F.silu(t_lin(params["time_embed"]["lin1"], t_emb)))
    if "label_embed" in params:
        l_emb = t_lin(params["label_embed"]["lin2"], F.silu(t_lin(params["label_embed"]["lin1"], label)))
        emb = t_emb + l_emb
    else:  # SD 1.x/2.x: timestep conditioning only
        emb = t_emb

    from sdxl_tpu.models.unet import unet_block_plan as plan_fn

    in_plan, mid_spec, out_plan = plan_fn(cfg)
    saved = []
    for spec, p in zip(in_plan, params["input_blocks"]):
        x = t_block(spec, p, x, emb, ctx)
        saved.append(x)
    mp = params["middle_block"]
    x = t_res(mp["res1"], x, emb)
    x = t_spatial(mp["transformer"], x, ctx, mid_spec.n_head)
    x = t_res(mp["res2"], x, emb)
    for spec, p in zip(out_plan, params["output_blocks"]):
        x = torch.cat([x, saved.pop()], dim=1)
        x = t_block(spec, p, x, emb, ctx)
    x = F.silu(t_gn(params["norm_out"], x))
    return t_conv(params["conv_out"], x)


def test_unet_forward_parity_with_torch():
    params = init_unet(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, TINY.context_dim)).astype(np.float32)
    label = rng.standard_normal((1, TINY.adm_in_channels)).astype(np.float32)
    t = np.array([500], dtype=np.int32)

    ours = np.asarray(
        unet_forward(params, TINY, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(label))
    )
    theirs = (
        t_unet(
            params,
            TINY,
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            torch.from_numpy(label),
        )
        .detach()
        .numpy()
    )
    assert ours.shape == (1, 16, 16, 4)
    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), theirs, atol=2e-4
    )


def test_unet_shapes_bf16():
    params = init_unet(jax.random.PRNGKey(1), TINY, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 16, 16, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 7, TINY.context_dim), jnp.bfloat16)
    label = jnp.zeros((2, TINY.adm_in_channels), jnp.bfloat16)
    out = unet_forward(params, TINY, x, jnp.array([1, 999]), ctx, label)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.bfloat16


def test_precomputed_cross_kv_matches():
    """unet_forward(cross_kv=precompute_cross_kv(...)) must be bit-identical
    to computing the cross K/V in-loop (same weights, same context)."""
    from sdxl_tpu.models.unet import precompute_cross_kv, stack_unet_transformers

    cfg = UNetConfig(
        adm_in_channels=24, in_channels=4, out_channels=4, model_channels=32,
        channel_mults=(1, 2, 4), n_head_channels=8,
        transformer_depths=(1, 1, 2), context_dim=48,
    )
    params = init_unet(jax.random.PRNGKey(5), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    x = jax.random.normal(ks[0], (2, 16, 16, 4), jnp.float32)
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jax.random.normal(ks[1], (2, 7, 48), jnp.float32)
    label = jax.random.normal(ks[2], (2, 24), jnp.float32)

    base = unet_forward(params, cfg, x, t, ctx, label)
    kv = precompute_cross_kv(params, cfg, ctx)
    cached = unet_forward(params, cfg, x, t, ctx, label, cross_kv=kv)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))

    # stacked (lax.scan) transformer path with kv
    stacked = stack_unet_transformers(params, min_depth=2)
    kv_s = precompute_cross_kv(stacked, cfg, ctx)
    out_s = unet_forward(stacked, cfg, x, t, ctx, label, cross_kv=kv_s)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_s), atol=1e-5)


def test_fused_qkv_matches():
    """fuse_unet_qkv: one [C,3C] self-attn matmul == three [C,C] matmuls."""
    from sdxl_tpu.models.unet import fuse_unet_qkv, stack_unet_transformers

    cfg = UNetConfig(
        adm_in_channels=24, in_channels=4, out_channels=4, model_channels=32,
        channel_mults=(1, 2, 4), n_head_channels=8,
        transformer_depths=(1, 1, 2), context_dim=48,
    )
    params = init_unet(jax.random.PRNGKey(7), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    x = jax.random.normal(ks[0], (2, 16, 16, 4), jnp.float32)
    t = jnp.full((2,), 300, jnp.int32)
    ctx = jax.random.normal(ks[1], (2, 7, 48), jnp.float32)
    label = jax.random.normal(ks[2], (2, 24), jnp.float32)

    base = unet_forward(params, cfg, x, t, ctx, label)
    fused = fuse_unet_qkv(params)
    out_f = unet_forward(fused, cfg, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_f), atol=2e-6)
    # idempotent + composes with stacking
    out_ff = unet_forward(fuse_unet_qkv(fused), cfg, x, t, ctx, label)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_ff))
    stacked = stack_unet_transformers(fused, min_depth=2)
    out_s = unet_forward(stacked, cfg, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_s), atol=1e-5)


def test_fused_upsample_conv_matches_reference_path():
    """fold_upsample_conv + upsample2x_conv == conv3x3(nearest2x(x)) — the
    exact phase regrouping (ops/conv.py)."""
    import numpy as np

    from sdxl_tpu.ops.conv import (
        conv2d,
        fold_upsample_conv,
        upsample2x_conv,
        upsample_nearest_2x,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    p = {
        "w": jax.random.normal(k1, (3, 3, 16, 24), jnp.float32) * 0.3,
        "b": jax.random.normal(k2, (24,), jnp.float32),
    }
    x = jax.random.normal(k3, (2, 9, 7, 16), jnp.float32)

    ref = conv2d(p, upsample_nearest_2x(x))
    fused = upsample2x_conv(fold_upsample_conv(p), x)
    assert fused.shape == ref.shape == (2, 18, 14, 24)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fuse_unet_qkv_folds_upsample_and_forward_matches():
    """Full prep (fuse_unet_qkv) keeps unet_forward numerically unchanged
    on a tiny config with upsample blocks."""
    import numpy as np

    from sdxl_tpu.models.unet import fuse_unet_qkv

    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    prepped = fuse_unet_qkv(params)
    # at least one upsample got the phase kernels
    assert any(
        "w4" in p.get("upsample", {}) for p in prepped["output_blocks"]
        if isinstance(p, dict)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16), jnp.float32)
    label = jax.random.normal(jax.random.PRNGKey(3), (1, 24), jnp.float32)
    y_raw = unet_forward(params, TINY, x, t, ctx, label)
    y_prep = unet_forward(prepped, TINY, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(y_prep), np.asarray(y_raw),
                               rtol=2e-4, atol=2e-5)


def test_unfold_upsample_conv_is_exact_inverse():
    """unfold_upsample_conv recovers the original 3x3 kernel bit-for-bit in
    f32 (the fold is a linear bijection on the taps; exporters rely on
    this, io/burn_mpk_write.py)."""
    import numpy as np

    from sdxl_tpu.ops.conv import fold_upsample_conv, unfold_upsample_conv

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    p = {
        "w": jax.random.normal(k1, (3, 3, 8, 12), jnp.float32),
        "b": jax.random.normal(k2, (12,), jnp.float32),
    }
    folded = fold_upsample_conv(p)
    assert "w" not in folded and "w4" in folded
    back = unfold_upsample_conv(folded)
    assert "w4" not in back
    np.testing.assert_allclose(np.asarray(back["w"]), np.asarray(p["w"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back["b"]), np.asarray(p["b"]))
    # no-ops on non-upsample / already-unfolded dicts
    assert unfold_upsample_conv(p) is p or "w" in unfold_upsample_conv(p)
