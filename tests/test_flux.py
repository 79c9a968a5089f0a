"""FLUX.1 transformer parity vs an independent torch mirror.

Same strategy as tests/test_mmdit.py: the mirror re-executes the SAME
weights with torch-native ops (F.layer_norm-free manual LN, F.sdpa,
F.gelu(tanh)) following the public FluxTransformer2DModel semantics —
written module-by-module from the diffusers code, not translated from
the JAX side, so a concat-order / chunk-order / RoPE-interleave slip on
either side fails the comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sdxl_tpu.configs import FluxConfig
from sdxl_tpu.models.flux import (
    apply_rope,
    flux_forward,
    init_flux,
    rope_tables,
)

TINY = FluxConfig(
    in_channels=16, num_layers=2, num_single_layers=2, n_heads=2,
    head_dim=8, joint_attention_dim=32, pooled_projection_dim=24,
    guidance_embeds=True, axes_dims=(4, 2, 2), time_sinusoid_dim=32,
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


def torch_rope_tables(cfg, gh, gw, n_txt):
    # literal transcription of FluxPosEmbed + get_1d_rotary_pos_embed
    # (repeat_interleave_real=True, use_real=True, theta=cfg.rope_theta)
    ids = torch.zeros(n_txt + gh * gw, 3, dtype=torch.float64)
    img = torch.zeros(gh, gw, 3, dtype=torch.float64)
    img[..., 1] += torch.arange(gh, dtype=torch.float64)[:, None]
    img[..., 2] += torch.arange(gw, dtype=torch.float64)[None, :]
    ids[n_txt:] = img.reshape(-1, 3)
    cos_l, sin_l = [], []
    for axis, dim in enumerate(cfg.axes_dims):
        freqs = 1.0 / cfg.rope_theta ** (
            torch.arange(0, dim, 2, dtype=torch.float64) / dim)
        out = torch.outer(ids[:, axis], freqs)
        cos_l.append(out.cos().repeat_interleave(2, dim=1))
        sin_l.append(out.sin().repeat_interleave(2, dim=1))
    return (torch.cat(cos_l, 1).float(), torch.cat(sin_l, 1).float())


def torch_apply_rope(x, cos, sin):
    # diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1);
    # x [B, H, T, hd], cos/sin [T, hd]
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x_real, x_imag = xr.unbind(-1)
    rot = torch.stack([-x_imag, x_real], dim=-1).reshape(x.shape)
    return (x.float() * cos + rot.float() * sin).to(x.dtype)


def rms(x, w):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + 1e-6)) * t(w)


def ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def heads(x, n):
    b, l, d = x.shape
    return x.view(b, l, n, d // n).transpose(1, 2)  # [B, H, T, hd]


def merge(x):
    return x.transpose(1, 2).reshape(x.shape[0], x.shape[2], -1)


def torch_flux(params, cfg, latent, timesteps, context, pooled, guidance):
    b, h, w, ch = latent.shape
    gh, gw = h // 2, w // 2
    # _pack_latents: NCHW view(B,C,gh,2,gw,2).permute(0,2,4,1,3,5)
    xn = t(latent).permute(0, 3, 1, 2)
    xp = xn.view(b, ch, gh, 2, gw, 2).permute(0, 2, 4, 1, 3, 5)
    xp = xp.reshape(b, gh * gw, ch * 4)

    x = lin(params["x_embedder"], xp)
    c = lin(params["context_embedder"], t(context))

    te = params["time_text_embed"]
    temb = lin(te["timestep_lin2"], F.silu(
        lin(te["timestep_lin1"],
            torch_timesteps(t(timesteps), cfg.time_sinusoid_dim))))
    temb = temb + lin(te["guidance_lin2"], F.silu(
        lin(te["guidance_lin1"],
            torch_timesteps(t(guidance), cfg.time_sinusoid_dim))))
    temb = temb + lin(te["text_lin2"],
                      F.silu(lin(te["text_lin1"], t(pooled))))

    cos, sin = torch_rope_tables(cfg, gh, gw, context.shape[1])
    n, lt = cfg.n_heads, context.shape[1]

    for p in params["blocks"]:
        sh, sc, g, sh2, sc2, g2 = lin(
            p["norm1"]["mod"], F.silu(temb)).chunk(6, -1)
        csh, csc, cg, csh2, csc2, cg2 = lin(
            p["norm1_context"]["mod"], F.silu(temb)).chunk(6, -1)
        nx = ln(x) * (1 + sc[:, None]) + sh[:, None]
        nc = ln(c) * (1 + csc[:, None]) + csh[:, None]
        a = p["attn"]
        q = heads(lin(a["to_q"], nx), n)
        k = heads(lin(a["to_k"], nx), n)
        v = heads(lin(a["to_v"], nx), n)
        cq = heads(lin(a["add_q_proj"], nc), n)
        ck = heads(lin(a["add_k_proj"], nc), n)
        cv = heads(lin(a["add_v_proj"], nc), n)
        q, k = rms(q, a["norm_q"]["w"]), rms(k, a["norm_k"]["w"])
        cq = rms(cq, a["norm_added_q"]["w"])
        ck = rms(ck, a["norm_added_k"]["w"])
        # FluxAttnProcessor: TEXT first in the joint sequence
        qj = torch.cat([cq, q], dim=2)
        kj = torch.cat([ck, k], dim=2)
        vj = torch.cat([cv, v], dim=2)
        qj = torch_apply_rope(qj, cos, sin)
        kj = torch_apply_rope(kj, cos, sin)
        att = merge(F.scaled_dot_product_attention(qj, kj, vj))
        ac, ax = att[:, :lt], att[:, lt:]
        x = x + g[:, None] * lin(a["to_out"], ax)
        nx2 = ln(x) * (1 + sc2[:, None]) + sh2[:, None]
        x = x + g2[:, None] * lin(
            p["mlp"]["out"],
            F.gelu(lin(p["mlp"]["in"], nx2), approximate="tanh"))
        c = c + cg[:, None] * lin(a["to_add_out"], ac)
        nc2 = ln(c) * (1 + csc2[:, None]) + csh2[:, None]
        c = c + cg2[:, None] * lin(
            p["mlp_context"]["out"],
            F.gelu(lin(p["mlp_context"]["in"], nc2), approximate="tanh"))

    xs = torch.cat([c, x], dim=1)
    for p in params["single_blocks"]:
        sh, sc, g = lin(p["norm"]["mod"], F.silu(temb)).chunk(3, -1)
        nx = ln(xs) * (1 + sc[:, None]) + sh[:, None]
        a = p["attn"]
        q = rms(heads(lin(a["to_q"], nx), n), a["norm_q"]["w"])
        k = rms(heads(lin(a["to_k"], nx), n), a["norm_k"]["w"])
        v = heads(lin(a["to_v"], nx), n)
        q = torch_apply_rope(q, cos, sin)
        k = torch_apply_rope(k, cos, sin)
        att = merge(F.scaled_dot_product_attention(q, k, v))
        mlp = F.gelu(lin(p["proj_mlp"], nx), approximate="tanh")
        xs = xs + g[:, None] * lin(p["proj_out"],
                                   torch.cat([att, mlp], dim=-1))
    x = xs[:, lt:]

    scale, shift = lin(params["norm_out"]["mod"],
                       F.silu(temb)).chunk(2, -1)
    x = ln(x) * (1 + scale[:, None]) + shift[:, None]
    out = lin(params["proj_out"], x)
    # _unpack_latents: view(B,gh,gw,C,2,2).permute(0,3,1,4,2,5) -> NCHW
    out = out.view(b, gh, gw, ch, 2, 2).permute(0, 3, 1, 4, 2, 5)
    out = out.reshape(b, ch, h, w)
    return out.permute(0, 2, 3, 1).numpy()  # NHWC for comparison


@pytest.fixture(scope="module")
def setup():
    params = init_flux(jax.random.PRNGKey(0), TINY, jnp.float32)
    rng = np.random.default_rng(1)
    latent = rng.standard_normal((2, 8, 12, 4), np.float32)
    context = rng.standard_normal((2, 7, 32), np.float32)
    pooled = rng.standard_normal((2, 24), np.float32)
    timesteps = np.asarray([421.0, 77.0], np.float32)
    guidance = np.asarray([3500.0, 3500.0], np.float32)
    return params, latent, context, pooled, timesteps, guidance


def test_flux_matches_torch_mirror(setup):
    params, latent, context, pooled, timesteps, guidance = setup
    out = np.asarray(flux_forward(
        params, TINY, jnp.asarray(latent), jnp.asarray(timesteps),
        jnp.asarray(context), jnp.asarray(pooled),
        guidance=jnp.asarray(guidance)))
    ref = torch_flux(params, TINY, latent, timesteps, context, pooled,
                     guidance)
    assert out.shape == ref.shape == (2, 8, 12, 4)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_rope_tables_transcription():
    cos, sin = rope_tables(TINY, 4, 6, 7)
    tc, ts = torch_rope_tables(TINY, 4, 6, 7)
    np.testing.assert_allclose(cos, tc.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(sin, ts.numpy(), rtol=1e-6, atol=1e-7)
    assert cos.shape == (7 + 24, TINY.head_dim)
    # text rows rotate by angle 0: cos 1, sin 0 -> RoPE is the identity
    np.testing.assert_array_equal(cos[:7], np.ones_like(cos[:7]))
    np.testing.assert_array_equal(sin[:7], np.zeros_like(sin[:7]))


def test_apply_rope_matches_transcription():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, 3, 8), np.float32)  # [B, T, H, hd]
    cos, sin = rope_tables(TINY, 2, 5, 0)
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                jnp.asarray(sin)))
    ref = torch_apply_rope(t(x).permute(0, 2, 1, 3),
                           torch.from_numpy(cos), torch.from_numpy(sin))
    np.testing.assert_allclose(out, ref.permute(0, 2, 1, 3).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_flux_schnell_variant_and_guidance_guard(setup):
    params, latent, context, pooled, timesteps, guidance = setup
    with pytest.raises(ValueError, match="guidance"):
        flux_forward(params, TINY, jnp.asarray(latent),
                     jnp.asarray(timesteps), jnp.asarray(context),
                     jnp.asarray(pooled))
    cfg_s = FluxConfig(**{**TINY.__dict__, "guidance_embeds": False})
    params_s = init_flux(jax.random.PRNGKey(2), cfg_s, jnp.float32)
    out = flux_forward(params_s, cfg_s, jnp.asarray(latent),
                       jnp.asarray(timesteps), jnp.asarray(context),
                       jnp.asarray(pooled))
    assert np.isfinite(np.asarray(out)).all()
    # guidance embedding actually matters on the dev variant
    o1 = np.asarray(flux_forward(
        params, TINY, jnp.asarray(latent), jnp.asarray(timesteps),
        jnp.asarray(context), jnp.asarray(pooled),
        guidance=jnp.asarray(guidance)))
    o2 = np.asarray(flux_forward(
        params, TINY, jnp.asarray(latent), jnp.asarray(timesteps),
        jnp.asarray(context), jnp.asarray(pooled),
        guidance=jnp.asarray(guidance * 0.1)))
    assert not np.allclose(o1, o2)


def test_flux_skip_layers(setup):
    params, latent, context, pooled, timesteps, guidance = setup
    args = (params, TINY, jnp.asarray(latent), jnp.asarray(timesteps),
            jnp.asarray(context), jnp.asarray(pooled))
    full = np.asarray(flux_forward(*args, guidance=jnp.asarray(guidance)))
    same = np.asarray(flux_forward(*args, guidance=jnp.asarray(guidance),
                                   skip_layers=()))
    np.testing.assert_array_equal(full, same)
    skipped = np.asarray(flux_forward(
        *args, guidance=jnp.asarray(guidance), skip_layers=(1,)))
    assert not np.allclose(full, skipped)
