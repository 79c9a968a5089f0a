"""MMDiT (SD3) parity vs an independent torch mirror.

The mirror re-executes the SAME weights with torch-native ops
(F.layer_norm / F.scaled_dot_product_attention / F.gelu(tanh)) following
the public SD3Transformer2DModel semantics — the same mirroring strategy
the UNet/CLIP/VAE parity tests use. It is written module-by-module
(sequential, torch idioms) rather than translating the JAX code, so a
transpose/chunk-order slip on either side fails the comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sdxl_tpu.configs import MMDiTConfig
from sdxl_tpu.models.mmdit import (
    cropped_pos_embed,
    init_mmdit,
    mmdit_forward,
)

TINY = MMDiTConfig(
    patch_size=2, in_channels=16, out_channels=16, num_layers=3,
    n_heads=4, head_dim=8, joint_attention_dim=48,
    pooled_projection_dim=40, pos_embed_max_size=16, time_sinusoid_dim=32,
)


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def lin(p, x):
    return x @ t(p["w"]) + t(p["b"])


def torch_timesteps(timesteps, dim):
    # diffusers Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)
    half = dim // 2
    exponent = -torch.log(torch.tensor(10000.0)) * torch.arange(half) / half
    emb = timesteps[:, None].float() * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


def torch_pos_embed(cfg, gh, gw):
    # literal transcription of diffusers get_2d_sincos_pos_embed +
    # PatchEmbed.cropped_pos_embed (base_size=64, interpolation_scale=1)
    def sincos_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    m = cfg.pos_embed_max_size
    base = 64
    grid_h = np.arange(m, dtype=np.float32) / (m / base)
    grid_w = np.arange(m, dtype=np.float32) / (m / base)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first, per the public code
    grid = np.stack(grid, axis=0).reshape([2, 1, m, m])
    emb_h = sincos_1d(cfg.hidden // 2, grid[0])
    emb_w = sincos_1d(cfg.hidden // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)  # [m*m, hidden]
    pos = pos.reshape(m, m, cfg.hidden)
    top = (m - gh) // 2
    left = (m - gw) // 2
    return pos[top:top + gh, left:left + gw].reshape(gh * gw, cfg.hidden)


def torch_attention(ap, nx, nc, cfg, pre_only):
    n_head = cfg.n_heads

    def heads(x):
        b, l, d = x.shape
        return x.view(b, l, n_head, d // n_head).transpose(1, 2)

    q = torch.cat([lin(ap["to_q"], nx), lin(ap["add_q_proj"], nc)], dim=1)
    k = torch.cat([lin(ap["to_k"], nx), lin(ap["add_k_proj"], nc)], dim=1)
    v = torch.cat([lin(ap["to_v"], nx), lin(ap["add_v_proj"], nc)], dim=1)
    att = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
    att = att.transpose(1, 2).reshape(q.shape)
    ax, ac = att[:, : nx.shape[1]], att[:, nx.shape[1]:]
    out_x = lin(ap["to_out"], ax)
    out_c = None if pre_only else lin(ap["to_add_out"], ac)
    return out_x, out_c


def torch_self_attn(ap, nx, cfg):
    n_head = cfg.n_heads

    def heads(x):
        b, l, d = x.shape
        return x.view(b, l, n_head, d // n_head).transpose(1, 2)

    q, k, v = (lin(ap[nm], nx) for nm in ("to_q", "to_k", "to_v"))
    att = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
    return lin(ap["to_out"], att.transpose(1, 2).reshape(q.shape))


def torch_block(p, x, c, temb, cfg, pre_only):
    hdim = cfg.hidden
    dual = "attn2" in p
    mod = lin(p["norm1"]["mod"], F.silu(temb))
    if dual:
        # SD35AdaLayerNormZeroX: 9-way chunk (attn, mlp, attn2)
        sh, sc, g, sh2, sc2, g2, sh_a2, sc_a2, g_a2 = mod.chunk(9, dim=-1)
        nx_a2 = (F.layer_norm(x, (hdim,), eps=1e-6) * (1 + sc_a2[:, None])
                 + sh_a2[:, None])
    else:
        sh, sc, g, sh2, sc2, g2 = mod.chunk(6, dim=-1)
    nx = F.layer_norm(x, (hdim,), eps=1e-6) * (1 + sc[:, None]) + sh[:, None]
    if pre_only:
        cmod = lin(p["norm1_context"]["mod"], F.silu(temb))
        csc, csh = cmod.chunk(2, dim=-1)  # AdaLayerNormContinuous: scale 1st
        nc = (F.layer_norm(c, (hdim,), eps=1e-6) * (1 + csc[:, None])
              + csh[:, None])
    else:
        cmod = lin(p["norm1_context"]["mod"], F.silu(temb))
        c_sh, c_sc, c_g, c_sh2, c_sc2, c_g2 = cmod.chunk(6, dim=-1)
        nc = (F.layer_norm(c, (hdim,), eps=1e-6) * (1 + c_sc[:, None])
              + c_sh[:, None])

    ax, ac = torch_attention(p["attn"], nx, nc, cfg, pre_only)
    x = x + g[:, None] * ax
    if dual:
        x = x + g_a2[:, None] * torch_self_attn(p["attn2"], nx_a2, cfg)
    nx2 = (F.layer_norm(x, (hdim,), eps=1e-6) * (1 + sc2[:, None])
           + sh2[:, None])
    x = x + g2[:, None] * lin(
        p["mlp"]["out"], F.gelu(lin(p["mlp"]["in"], nx2), approximate="tanh")
    )
    if pre_only:
        return x, None
    c = c + c_g[:, None] * ac
    nc2 = (F.layer_norm(c, (hdim,), eps=1e-6) * (1 + c_sc2[:, None])
           + c_sh2[:, None])
    c = c + c_g2[:, None] * lin(
        p["mlp_context"]["out"],
        F.gelu(lin(p["mlp_context"]["in"], nc2), approximate="tanh"),
    )
    return x, c


def torch_mmdit(params, cfg, x_nhwc, timesteps, context, pooled):
    b, h, w, cin = x_nhwc.shape
    pN = cfg.patch_size
    gh, gw = h // pN, w // pN

    x = t(x_nhwc)
    # conv(k=p, s=p) patchify as unfold + linear
    xp = x.view(b, gh, pN, gw, pN, cin).permute(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(b, gh * gw, pN * pN * cin)
    tokens = lin(params["pos_embed"]["proj"], xp)
    tokens = tokens + t(torch_pos_embed(cfg, gh, gw))[None]

    te = params["time_text_embed"]
    t_sin = torch_timesteps(t(timesteps), cfg.time_sinusoid_dim)
    temb = lin(te["timestep_lin2"], F.silu(lin(te["timestep_lin1"], t_sin)))
    temb = temb + lin(te["text_lin2"],
                      F.silu(lin(te["text_lin1"], t(pooled))))

    c = lin(params["context_embedder"], t(context))

    n = len(params["blocks"])
    for i, blk in enumerate(params["blocks"]):
        tokens, c = torch_block(blk, tokens, c, temb, cfg, i == n - 1)

    mod = lin(params["norm_out"]["mod"], F.silu(temb))
    sc, sh = mod.chunk(2, dim=-1)
    tokens = (F.layer_norm(tokens, (cfg.hidden,), eps=1e-6)
              * (1 + sc[:, None]) + sh[:, None])
    out = lin(params["proj_out"], tokens)
    out = out.view(b, gh, gw, pN, pN, cfg.out_channels)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
    return out.numpy()


@pytest.fixture(scope="module")
def setup():
    params = init_mmdit(jax.random.PRNGKey(0), TINY, jnp.float32)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)))
    ts = np.asarray([500.0, 10.0], np.float32)
    ctx = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (2, 11, 48)))
    pooled = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (2, 40)))
    return params, x, ts, ctx, pooled


def test_mmdit_matches_torch_mirror(setup):
    params, x, ts, ctx, pooled = setup
    ours = np.asarray(
        mmdit_forward(params, TINY, jnp.asarray(x), jnp.asarray(ts),
                      jnp.asarray(ctx), jnp.asarray(pooled))
    )
    ref = torch_mmdit(jax.tree_util.tree_map(np.asarray, params), TINY, x,
                      ts, ctx, pooled)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_mmdit_dual_attention_matches_torch_mirror(setup):
    """SD3.5-medium's dual-attention blocks (extra latent-stream
    self-attention with a 9-way adaLN chunk) vs the torch mirror."""
    _, x, ts, ctx, pooled = setup
    cfg = MMDiTConfig(**{**TINY.__dict__, "dual_attention_layers": (0, 1)})
    params = init_mmdit(jax.random.PRNGKey(5), cfg, jnp.float32)
    assert "attn2" in params["blocks"][0] and "attn2" in params["blocks"][1]
    assert "attn2" not in params["blocks"][2]
    assert params["blocks"][0]["norm1"]["mod"]["w"].shape[1] == 9 * cfg.hidden
    ours = np.asarray(
        mmdit_forward(params, cfg, jnp.asarray(x), jnp.asarray(ts),
                      jnp.asarray(ctx), jnp.asarray(pooled))
    )
    ref = torch_mmdit(jax.tree_util.tree_map(np.asarray, params), cfg, x,
                      ts, ctx, pooled)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_mmdit_qk_norm_variant_runs_and_differs(setup):
    params, x, ts, ctx, pooled = setup
    cfg = MMDiTConfig(**{**TINY.__dict__, "qk_norm": "rms"})
    p2 = init_mmdit(jax.random.PRNGKey(0), cfg, jnp.float32)
    out = mmdit_forward(p2, cfg, jnp.asarray(x), jnp.asarray(ts),
                        jnp.asarray(ctx), jnp.asarray(pooled))
    assert np.isfinite(np.asarray(out)).all()
    base = mmdit_forward(params, TINY, jnp.asarray(x), jnp.asarray(ts),
                         jnp.asarray(ctx), jnp.asarray(pooled))
    # unit RMS scales still change the attention logits distribution
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_pos_embed_crop_matches_transcription():
    for gh, gw in ((4, 4), (4, 8), (8, 4), (16, 16)):
        ours = cropped_pos_embed(TINY, gh, gw)
        ref = torch_pos_embed(TINY, gh, gw)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-6)
    with pytest.raises(ValueError, match="pos_embed_max_size"):
        cropped_pos_embed(TINY, 32, 4)


def test_mmdit_resolution_flexibility(setup):
    """The same weights serve any latent grid <= pos_embed_max_size (the
    center-cropped grid), incl. non-square."""
    params, _, ts, ctx, pooled = setup
    for h, w in ((8, 8), (8, 16), (24, 8)):
        x = jax.random.normal(jax.random.PRNGKey(9), (2, h, w, 16))
        out = mmdit_forward(params, TINY, x, jnp.asarray(ts),
                            jnp.asarray(ctx), jnp.asarray(pooled))
        assert out.shape == (2, h, w, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_fuse_mmdit_qkv_exact(setup):
    """Fused per-stream qkv projections == the separate ones (column
    blocks of a matmul are independent), incl. dual-attention blocks."""
    from sdxl_tpu.models.mmdit import fuse_mmdit_qkv

    _, x, ts, ctx, pooled = setup
    cfg = MMDiTConfig(**{**TINY.__dict__, "dual_attention_layers": (1,)})
    params = init_mmdit(jax.random.PRNGKey(8), cfg, jnp.float32)
    base = mmdit_forward(params, cfg, jnp.asarray(x), jnp.asarray(ts),
                         jnp.asarray(ctx), jnp.asarray(pooled))
    fused = fuse_mmdit_qkv(params)
    assert "qkv" in fused["blocks"][0]["attn"]
    assert "add_qkv" in fused["blocks"][0]["attn"]
    assert "qkv" in fused["blocks"][1]["attn2"]
    out = mmdit_forward(fused, cfg, jnp.asarray(x), jnp.asarray(ts),
                        jnp.asarray(ctx), jnp.asarray(pooled))
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-6)
    # idempotent
    refused = fuse_mmdit_qkv(fused)
    out2 = mmdit_forward(refused, cfg, jnp.asarray(x), jnp.asarray(ts),
                         jnp.asarray(ctx), jnp.asarray(pooled))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
