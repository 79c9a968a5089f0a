"""ControlNet tests: zero-conv identity, torch-mirror parity of the full
guided forward, diffusers-layout loader roundtrip, per-step window rule,
and sampler/pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sdxl_tpu.configs import DiffuserConfig
from sdxl_tpu.io.diffusers_sdxl import build_controlnet_from_diffusers
from sdxl_tpu.models.controlnet import (
    control_cond_embed,
    controlnet_forward,
    init_controlnet,
    precompute_control_cross_kv,
)
from sdxl_tpu.models.unet import init_unet, unet_block_plan, unet_forward
from sdxl_tpu.pipeline.sampler import _control_window_scales

from tests.test_diffusers_sdxl import inv_dif_res, inv_dif_spatial
from tests.test_hf_sdxl import inv_conv, inv_linear
from tests.test_io import assert_trees_close
from tests.test_unet import (
    TINY,
    t_block,
    t_conv,
    t_lin,
    t_res,
    t_spatial,
    tt,
)


def _randomize_zero_convs(params, key):
    """Give the zero convs real values so control residuals are nonzero
    (as in a trained checkpoint)."""
    p = dict(params)
    zc = {"zero_convs": params["zero_convs"],
          "zero_conv_mid": params["zero_conv_mid"]}
    counter = [0]

    def rnd(l):
        counter[0] += 1
        return jax.random.normal(
            jax.random.fold_in(key, counter[0]), l.shape, l.dtype
        ) * 0.05

    zc = jax.tree.map(rnd, zc)
    p["zero_convs"] = zc["zero_convs"]
    p["zero_conv_mid"] = zc["zero_conv_mid"]
    return p


def _tiny_inputs(seed=7, b=1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, 16, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((b, 7, TINY.context_dim)).astype(np.float32)
    label = rng.standard_normal((b, TINY.adm_in_channels)).astype(np.float32)
    t = np.full((b,), 500, dtype=np.int32)
    img = rng.random((b, 128, 128, 3)).astype(np.float32)
    return x, ctx, label, t, img


def test_zero_init_controlnet_is_identity():
    """Freshly initialized zero convs -> residuals exactly zero -> the
    guided UNet output equals the unguided one (the property that makes
    ControlNet trainable from a copy)."""
    unet = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    cn = init_controlnet(jax.random.PRNGKey(1), TINY, jnp.float32)
    x, ctx, label, t, img = _tiny_inputs()

    ce = control_cond_embed(cn["cond_embed"], jnp.asarray(img))
    assert ce.shape == (1, 16, 16, TINY.model_channels)
    np.testing.assert_array_equal(np.asarray(ce), 0.0)  # zero conv_out

    down, mid = controlnet_forward(
        cn, TINY, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(label), ce,
    )
    for d in down:
        np.testing.assert_array_equal(np.asarray(d), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)

    base = unet_forward(unet, TINY, jnp.asarray(x), jnp.asarray(t),
                        jnp.asarray(ctx), jnp.asarray(label))
    guided = unet_forward(unet, TINY, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx), jnp.asarray(label),
                          control_residuals=(down, mid))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(guided))


# -- torch mirror ------------------------------------------------------------

def t_conv1x1(p, x):
    return t_conv(p, x, padding=0)


def t_cond_embed(p, img):
    x = F.silu(t_conv(p["conv_in"], img))
    for blk in p["blocks"]:
        x = F.silu(t_conv(blk["conv1"], x))
        x = F.silu(t_conv(blk["conv2"], x, stride=2))
    return t_conv(p["conv_out"], x)


def t_embeds(params, cfg, t, label):
    half = cfg.model_channels // 2
    freqs = torch.exp(
        -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    t_emb = torch.cat([torch.cos(args), torch.sin(args)], dim=1)
    t_emb = t_lin(params["time_embed"]["lin2"],
                  F.silu(t_lin(params["time_embed"]["lin1"], t_emb)))
    if "label_embed" in params:
        l_emb = t_lin(params["label_embed"]["lin2"],
                      F.silu(t_lin(params["label_embed"]["lin1"], label)))
        return t_emb + l_emb
    return t_emb


def t_controlnet(params, cfg, x, t, ctx, label, cond_emb):
    emb = t_embeds(params, cfg, t, label)
    in_plan, mid_spec, _ = unet_block_plan(cfg)
    down = []
    for i, (spec, p, zc) in enumerate(
        zip(in_plan, params["input_blocks"], params["zero_convs"])
    ):
        x = t_block(spec, p, x, emb, ctx)
        if i == 0:
            x = x + cond_emb
        down.append(t_conv1x1(zc, x))
    mp = params["middle_block"]
    x = t_res(mp["res1"], x, emb)
    x = t_spatial(mp["transformer"], x, ctx, mid_spec.n_head)
    x = t_res(mp["res2"], x, emb)
    return down, t_conv1x1(params["zero_conv_mid"], x)


def t_unet_controlled(params, cfg, x, t, ctx, label, down, mid):
    emb = t_embeds(params, cfg, t, label)
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    saved = []
    for spec, p in zip(in_plan, params["input_blocks"]):
        x = t_block(spec, p, x, emb, ctx)
        saved.append(x)
    saved = [s + r for s, r in zip(saved, down)]
    mp = params["middle_block"]
    x = t_res(mp["res1"], x, emb)
    x = t_spatial(mp["transformer"], x, ctx, mid_spec.n_head)
    x = t_res(mp["res2"], x, emb)
    x = x + mid
    for spec, p in zip(out_plan, params["output_blocks"]):
        x = torch.cat([x, saved.pop()], dim=1)
        x = t_block(spec, p, x, emb, ctx)
    x = F.silu(
        F.group_norm(x, 32, tt(params["norm_out"]["gamma"]),
                     tt(params["norm_out"]["beta"]))
    )
    return t_conv(params["conv_out"], x)


def test_controlled_forward_parity_with_torch():
    """The FULL guided prediction (cond-embed -> trunk -> residual
    injection -> UNet) re-executed functionally in PyTorch from the same
    weights."""
    unet = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    cn = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(1), TINY, jnp.float32),
        jax.random.PRNGKey(2),
    )
    x, ctx, label, t, img = _tiny_inputs()

    ce = control_cond_embed(cn["cond_embed"], jnp.asarray(img))
    down, mid = controlnet_forward(
        cn, TINY, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(label), ce,
    )
    ours = np.asarray(unet_forward(
        unet, TINY, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(label), control_residuals=(down, mid),
    ))

    nchw = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))  # noqa
    t_ce = t_cond_embed(cn["cond_embed"], nchw(img))
    t_down, t_mid = t_controlnet(
        cn, TINY, nchw(x), torch.from_numpy(t), torch.from_numpy(ctx),
        torch.from_numpy(label), t_ce,
    )
    theirs = t_unet_controlled(
        unet, TINY, nchw(x), torch.from_numpy(t), torch.from_numpy(ctx),
        torch.from_numpy(label), t_down, t_mid,
    ).detach().numpy()

    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), theirs, atol=3e-4
    )


def test_control_cross_kv_matches():
    cn = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(1), TINY, jnp.float32),
        jax.random.PRNGKey(2),
    )
    x, ctx, label, t, img = _tiny_inputs()
    ce = control_cond_embed(cn["cond_embed"], jnp.asarray(img))
    kv = precompute_control_cross_kv(cn, TINY, jnp.asarray(ctx))
    a = controlnet_forward(cn, TINY, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(ctx), jnp.asarray(label), ce)
    b = controlnet_forward(cn, TINY, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(ctx), jnp.asarray(label), ce,
                           cross_kv=kv)
    for u, v in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-5)


# -- diffusers loader roundtrip ---------------------------------------------

def make_diffusers_controlnet_dict(cfg, params):
    d = {}
    in_plan, _, _ = unet_block_plan(cfg)
    inv_linear(d, "time_embedding.linear_1", params["time_embed"]["lin1"])
    inv_linear(d, "time_embedding.linear_2", params["time_embed"]["lin2"])
    if "label_embed" in params:
        inv_linear(d, "add_embedding.linear_1", params["label_embed"]["lin1"])
        inv_linear(d, "add_embedding.linear_2", params["label_embed"]["lin2"])
    inv_conv(d, "conv_in", params["input_blocks"][0]["conv"])

    idx = 1
    for level in range(len(cfg.channel_mults)):
        for j in range(2):
            p = params["input_blocks"][idx]
            inv_dif_res(d, f"down_blocks.{level}.resnets.{j}", p["res"])
            if "transformer" in p:
                inv_dif_spatial(
                    d, f"down_blocks.{level}.attentions.{j}", p["transformer"]
                )
            idx += 1
        if idx < len(in_plan) and in_plan[idx].kind == "down":
            inv_conv(d, f"down_blocks.{level}.downsamplers.0.conv",
                     params["input_blocks"][idx]["conv"])
            idx += 1

    inv_dif_res(d, "mid_block.resnets.0", params["middle_block"]["res1"])
    inv_dif_spatial(d, "mid_block.attentions.0",
                    params["middle_block"]["transformer"])
    inv_dif_res(d, "mid_block.resnets.1", params["middle_block"]["res2"])

    ce = params["cond_embed"]
    inv_conv(d, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for i, blk in enumerate(ce["blocks"]):
        inv_conv(d, f"controlnet_cond_embedding.blocks.{2 * i}", blk["conv1"])
        inv_conv(d, f"controlnet_cond_embedding.blocks.{2 * i + 1}",
                 blk["conv2"])
    inv_conv(d, "controlnet_cond_embedding.conv_out", ce["conv_out"])

    for i, zc in enumerate(params["zero_convs"]):
        inv_conv(d, f"controlnet_down_blocks.{i}", zc)
    inv_conv(d, "controlnet_mid_block", params["zero_conv_mid"])
    return d


def test_controlnet_diffusers_roundtrip():
    params = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(3), TINY, jnp.float32),
        jax.random.PRNGKey(4),
    )
    d = make_diffusers_controlnet_dict(TINY, params)
    loaded = build_controlnet_from_diffusers(d, TINY, jnp.float32)
    assert_trees_close(params, loaded)


# -- per-step window rule ----------------------------------------------------

def test_control_window_scales_matches_diffusers_rule():
    """Literal transcription of diffusers' controlnet_keep loop."""
    n = 31
    for start, end in [(0.0, 1.0), (0.0, 0.5), (0.25, 0.75), (0.9, 1.0)]:
        keeps = [
            1.0 - float(i / n < start or (i + 1) / n > end) for i in range(n)
        ]
        ours = np.asarray(_control_window_scales(n, 2.5, (start, end)))
        np.testing.assert_allclose(ours, np.array(keeps) * 2.5)
    np.testing.assert_array_equal(
        np.asarray(_control_window_scales(10, 1.0, (0.0, 1.0))), 1.0
    )


# -- sampler integration -----------------------------------------------------

def _tiny_pipe():
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )


def test_pipeline_controlnet_scale_and_identity():
    """scale=0 reproduces the uncontrolled image exactly; scale=1 with a
    (randomized-zero-conv) ControlNet changes it; the window rule applied
    to the full range equals the plain scale. Runs the real pipeline
    txt2img on a tiny config, DDIM + euler."""
    pipe = _tiny_pipe()
    pipe.controlnet_params = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(11),
                        pipe.diffuser_cfg.unet_config(), jnp.float32),
        jax.random.PRNGKey(12),
    )
    pipe.controlnet_cfg = pipe.diffuser_cfg.unet_config()
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(
        np.uint8
    )

    kw = dict(resolution=(64, 64), n_steps=2, seed=5, profile_stages=False)
    base = pipe.txt2img("a cat", **kw)
    off = pipe.txt2img("a cat", control_image=img, control_scale=0.0, **kw)
    np.testing.assert_array_equal(base, off)

    on = pipe.txt2img("a cat", control_image=img, control_scale=1.0, **kw)
    assert np.abs(on.astype(int) - base.astype(int)).max() > 0

    # a window covering no steps == scale 0
    none = pipe.txt2img("a cat", control_image=img, control_scale=1.0,
                        control_start=0.99, control_end=1.0, **kw)
    np.testing.assert_array_equal(base, none)

    # euler path
    base_e = pipe.txt2img("a cat", sampler="euler", **kw)
    on_e = pipe.txt2img("a cat", sampler="euler", control_image=img, **kw)
    assert np.abs(on_e.astype(int) - base_e.astype(int)).max() > 0

    # preview path is bit-identical to the unsegmented controlled run
    frames = []
    on_prev = pipe.txt2img(
        "a cat", control_image=img, control_scale=1.0, preview_every=1,
        preview_callback=lambda d, t, rgb: frames.append((d, t)), **kw,
    )
    np.testing.assert_array_equal(on, on_prev)
    assert frames  # callback fired


def test_pipeline_control_image_validation():
    pipe = _tiny_pipe()
    img = np.zeros((64, 64, 3), np.uint8)
    try:
        pipe.txt2img("x", resolution=(64, 64), n_steps=1,
                     control_image=img, profile_stages=False)
        raise AssertionError("expected ValueError (no controlnet loaded)")
    except ValueError as e:
        assert "no ControlNet" in str(e)

    pipe.controlnet_params = init_controlnet(
        jax.random.PRNGKey(0), pipe.diffuser_cfg.unet_config(), jnp.float32
    )
    pipe.controlnet_cfg = pipe.diffuser_cfg.unet_config()
    try:
        pipe.txt2img("x", resolution=(64, 64), n_steps=1,
                     control_image=np.zeros((32, 32, 3), np.uint8),
                     profile_stages=False)
        raise AssertionError("expected ValueError (size mismatch)")
    except ValueError as e:
        assert "must match" in str(e)


def test_control_window_scales_multi_stacks_columns():
    """Multi-ControlNet: one per-step scale column per net, each obeying
    its own window."""
    out = np.asarray(_control_window_scales(
        10, (2.0, 3.0), ((0.0, 1.0), (0.0, 0.5))
    ))
    assert out.shape == (10, 2)
    np.testing.assert_allclose(out[:, 0], 2.0)
    np.testing.assert_allclose(
        out[:, 1],
        np.asarray(_control_window_scales(10, 3.0, (0.0, 0.5))),
    )


def test_multi_controlnet_sums_residuals():
    """Multi-ControlNet correctness at pipeline level:
    - two copies of one net at scale 0.5 each == that net at scale 1.0
      (residual-sum linearity),
    - zeroing net B via its window reproduces net A alone,
    - two different nets differ from either alone."""
    pipe = _tiny_pipe()
    ucfg = pipe.diffuser_cfg.unet_config()
    cn_a = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(11), ucfg, jnp.float32),
        jax.random.PRNGKey(12),
    )
    cn_b = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(21), ucfg, jnp.float32),
        jax.random.PRNGKey(22),
    )
    rng = np.random.default_rng(0)
    img_a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    img_b = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    kw = dict(resolution=(64, 64), n_steps=2, seed=5, profile_stages=False)

    pipe.controlnet_params = cn_a
    pipe.controlnet_cfg = ucfg
    solo = pipe.txt2img("a cat", control_image=img_a, control_scale=1.0,
                        **kw)

    pipe.controlnet_params = (cn_a, cn_a)
    halves = pipe.txt2img("a cat", control_image=[img_a, img_a],
                          control_scale=[0.5, 0.5], **kw)
    assert np.abs(halves.astype(int) - solo.astype(int)).max() <= 1

    pipe.controlnet_params = (cn_a, cn_b)
    b_off = pipe.txt2img("a cat", control_image=[img_a, img_b],
                         control_scale=[1.0, 1.0],
                         control_start=[0.0, 0.99],
                         control_end=[1.0, 1.0], **kw)
    assert np.abs(b_off.astype(int) - solo.astype(int)).max() <= 1

    both = pipe.txt2img("a cat", control_image=[img_a, img_b],
                        control_scale=[1.0, 1.0], **kw)
    assert np.abs(both.astype(int) - solo.astype(int)).max() > 1

    # one shared image broadcast to all nets (the serving path)
    shared = pipe.txt2img("a cat", control_image=img_a, control_scale=1.0,
                          **kw)
    assert shared.shape == solo.shape

    # image-count mismatch is a clear error
    try:
        pipe.txt2img("a cat", control_image=[img_a], **kw)
        raise AssertionError("expected ValueError (1 image, 2 nets)")
    except ValueError as e:
        assert "ControlNet" in str(e)


def test_img2img_controlnet_scale_and_identity():
    pipe = _tiny_pipe()
    pipe.controlnet_params = _randomize_zero_convs(
        init_controlnet(jax.random.PRNGKey(31),
                        pipe.diffuser_cfg.unet_config(), jnp.float32),
        jax.random.PRNGKey(32),
    )
    pipe.controlnet_cfg = pipe.diffuser_cfg.unet_config()
    rng = np.random.default_rng(2)
    ref = (rng.random((1, 64, 64, 3)) * 255).astype(np.uint8)
    cimg = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

    kw = dict(strength=0.5, n_steps=4, seed=9)
    base = pipe.img2img("a dog", ref, **kw)
    off = pipe.img2img("a dog", ref, control_image=cimg, control_scale=0.0,
                       **kw)
    np.testing.assert_array_equal(base, off)
    on = pipe.img2img("a dog", ref, control_image=cimg, **kw)
    assert np.abs(on.astype(int) - base.astype(int)).max() > 0
