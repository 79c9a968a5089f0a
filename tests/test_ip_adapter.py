"""IP-Adapter (arXiv:2308.06721) + CLIP vision tower tests.

The vision tower is pinned against transformers'
CLIPVisionModelWithProjection (identical random weights through the real
torch model); the decoupled cross-attention is pinned against a literal
torch transcription of the official IPAttnProcessor; pipeline-level
identity/effect tests cover the end-to-end wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdxl_tpu.models.clip_vision import (
    CLIPVisionConfig,
    clip_vision_embed,
    clip_vision_hidden,
    init_clip_vision,
    preprocess_image,
)
from sdxl_tpu.models.ip_adapter import (
    IPAdapterConfig,
    init_ip_adapter,
    ip_image_tokens,
    merge_ip_kv,
    organize_ip_layers,
)
from sdxl_tpu.models.unet import precompute_cross_kv

TINY_VISION = CLIPVisionConfig(image_size=28, patch_size=14, n_state=32,
                               n_head=4, n_layer=2, embed_dim=16)


def _torch_tiny_vision():
    from transformers import CLIPVisionConfig as TCfg
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(0)
    cfg = TCfg(hidden_size=32, intermediate_size=128, num_hidden_layers=2,
               num_attention_heads=4, image_size=28, patch_size=14,
               projection_dim=16, hidden_act="gelu")
    return CLIPVisionModelWithProjection(cfg).eval()


def test_vision_tower_matches_transformers():
    """Identical weights through the real transformers model and our
    pytree forward: image_embeds and the penultimate hidden state must
    agree. Pins patch/CLS/position embedding order, the pre/post LN
    placement, bidirectional attention, and the projection transpose."""
    from sdxl_tpu.io.ip_adapter import build_clip_vision_from_tensors

    tm = _torch_tiny_vision()
    tensors = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = build_clip_vision_from_tensors(tensors, TINY_VISION)

    rng = np.random.default_rng(1)
    # already-preprocessed pixels: parity isolates the tower itself
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    ours_embed = clip_vision_embed(params, TINY_VISION, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(ours_embed),
                               out.image_embeds.numpy(),
                               rtol=2e-4, atol=2e-5)
    # penultimate hidden (the "plus" Resampler input): transformers
    # hidden_states[-2] == after n_layer-1 blocks, pre post-LN
    ours_pen = clip_vision_hidden(params, TINY_VISION, jnp.asarray(px),
                                  n_blocks=TINY_VISION.n_layer - 1)
    np.testing.assert_allclose(np.asarray(ours_pen),
                               out.hidden_states[-2].numpy(),
                               rtol=2e-4, atol=2e-5)


def test_preprocess_image_resize_and_normalize():
    img = np.full((64, 48, 3), 255, np.uint8)
    out = np.asarray(preprocess_image(img, TINY_VISION))
    assert out.shape == (1, 28, 28, 3)
    # white -> (1 - mean) / std per channel
    from sdxl_tpu.models.clip_vision import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    expect = (1.0 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


def test_image_proj_model_matches_torch_transcription():
    """ImageProjModel: Linear -> reshape -> LayerNorm, literal official
    forward."""
    cfg = IPAdapterConfig(clip_embed_dim=16, context_dim=48, n_tokens=4)
    rng = np.random.default_rng(2)
    w = rng.standard_normal((cfg.n_tokens * cfg.context_dim, 16)) * 0.05
    b = rng.standard_normal(cfg.n_tokens * cfg.context_dim) * 0.01
    g = rng.standard_normal(cfg.context_dim) * 0.1 + 1.0
    beta = rng.standard_normal(cfg.context_dim) * 0.01
    params = {
        "proj": {"w": jnp.asarray(w.T, jnp.float32),
                 "b": jnp.asarray(b, jnp.float32)},
        "norm": {"gamma": jnp.asarray(g, jnp.float32),
                 "beta": jnp.asarray(beta, jnp.float32)},
    }
    embeds = rng.standard_normal((3, 16)).astype(np.float32)

    t = torch.from_numpy
    lin = torch.nn.Linear(16, cfg.n_tokens * cfg.context_dim)
    lin.weight.data = t(w.astype(np.float32))
    lin.bias.data = t(b.astype(np.float32))
    norm = torch.nn.LayerNorm(cfg.context_dim)
    norm.weight.data = t(g.astype(np.float32))
    norm.bias.data = t(beta.astype(np.float32))
    with torch.no_grad():
        ref = norm(lin(t(embeds)).reshape(-1, cfg.n_tokens,
                                          cfg.context_dim)).numpy()
    ours = ip_image_tokens(params, cfg, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-6)


def test_decoupled_attention_matches_ip_attn_processor():
    """One cross-attention layer with ip K/V == a literal transcription
    of the official IPAttnProcessor: sdpa(text) + scale * sdpa(image),
    summed BEFORE the output projection."""
    from sdxl_tpu.models.unet import _mha

    rng = np.random.default_rng(3)
    c, ctx_d, n_head, n_tok = 32, 48, 4, 4
    x = rng.standard_normal((2, 9, c)).astype(np.float32)
    text = rng.standard_normal((2, 7, ctx_d)).astype(np.float32)
    ip_tok = rng.standard_normal((2, n_tok, ctx_d)).astype(np.float32)
    scale = 0.7

    def w(shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    wq, wk, wv = w((c, c)), w((ctx_d, c)), w((ctx_d, c))
    wki, wvi = w((ctx_d, c)), w((ctx_d, c))
    wo, bo = w((c, c)), w((c,))

    p = {"q": {"w": jnp.asarray(wq)}, "k": {"w": jnp.asarray(wk)},
         "v": {"w": jnp.asarray(wv)},
         "out": {"w": jnp.asarray(wo), "b": jnp.asarray(bo)}}
    kv = {
        "k": jnp.asarray(text) @ jnp.asarray(wk),
        "v": jnp.asarray(text) @ jnp.asarray(wv),
        "ip_k": jnp.asarray(ip_tok) @ jnp.asarray(wki),
        "ip_v": (jnp.asarray(ip_tok) @ jnp.asarray(wvi)) * scale,
    }
    ours = _mha(p, jnp.asarray(x), jnp.asarray(text), n_head, kv=kv)

    def heads(t_):
        b, n, _ = t_.shape
        return t_.reshape(b, n, n_head, c // n_head).transpose(1, 2)

    tx, tt, ti = map(torch.from_numpy, (x, text, ip_tok))
    q = heads(tx @ torch.from_numpy(wq))
    k = heads(tt @ torch.from_numpy(wk))
    v = heads(tt @ torch.from_numpy(wv))
    hidden = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    k_ip = heads(ti @ torch.from_numpy(wki))
    v_ip = heads(ti @ torch.from_numpy(wvi))
    ip_hidden = torch.nn.functional.scaled_dot_product_attention(q, k_ip, v_ip)
    hidden = hidden + scale * ip_hidden
    hidden = hidden.transpose(1, 2).reshape(2, 9, c)
    ref = (hidden @ torch.from_numpy(wo) + torch.from_numpy(bo)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_organize_ip_layers_counts():
    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from tests.test_sampler import TINY_BASE

    ucfg = SDXL_BASE_DIFFUSER.unet_config()
    # SDXL base: 24 down + 36 up + 10 mid = 70 cross-attn layers (the
    # official sdxl adapter ships exactly 70 to_k_ip/to_v_ip pairs)
    flat = [{"k": i, "v": i} for i in range(70)]
    tree = organize_ip_layers(flat, ucfg)
    assert sum(len(v) for v in tree["input_blocks"].values()) == 24
    assert sum(len(v) for v in tree["output_blocks"].values()) == 36
    assert len(tree["middle_block"]) == 10
    # checkpoint order: input asc, output asc, middle last
    assert tree["input_blocks"][4][0]["k"] == 0
    assert tree["middle_block"][0]["k"] == 60

    with pytest.raises(ValueError, match="mismatch"):
        organize_ip_layers(flat[:-1], ucfg)
    with pytest.raises(ValueError, match="mismatch"):
        organize_ip_layers(flat + [{"k": 70, "v": 70}], ucfg)

    from sdxl_tpu.models.unet import unet_block_plan

    ucfg_t = TINY_BASE.unet_config()
    in_plan, mid, out_plan = unet_block_plan(ucfg_t)
    n = (sum(s.depth for s in in_plan + out_plan
             if s.kind.startswith("res_t")) + mid.depth)
    tiny = organize_ip_layers([{"k": i, "v": i} for i in range(n)], ucfg_t)
    assert len(tiny["middle_block"]) == mid.depth


def test_ip_adapter_file_roundtrip(tmp_path):
    """Official-layout safetensors (odd ip_adapter indices, torch [out,in]
    weights) -> loader -> organized tree with transposed weights and an
    inferred config."""
    from safetensors.numpy import save_file

    from sdxl_tpu.io.ip_adapter import load_ip_adapter_file
    from tests.test_sampler import TINY_BASE

    ucfg = TINY_BASE.unet_config()
    ctx_d = ucfg.context_dim
    rng = np.random.default_rng(4)
    # tiny config: 14 cross-attn layers (see test above)
    tensors = {
        "image_proj.proj.weight":
            rng.standard_normal((4 * ctx_d, 16)).astype(np.float32),
        "image_proj.proj.bias":
            rng.standard_normal(4 * ctx_d).astype(np.float32),
        "image_proj.norm.weight": np.ones(ctx_d, np.float32),
        "image_proj.norm.bias": np.zeros(ctx_d, np.float32),
    }
    inners = []
    in_plan, mid, out_plan = __import__(
        "sdxl_tpu.models.unet", fromlist=["unet_block_plan"]
    ).unet_block_plan(ucfg)
    for spec in ([s for s in in_plan if s.kind.startswith("res_t")]
                 + [s for s in out_plan if s.kind.startswith("res_t")]
                 + [mid]):
        inners += [spec.ch_out] * spec.depth
    for j, inner in enumerate(inners):
        idx = 2 * j + 1  # official numbering: attn2 processors at 1,3,5,...
        tensors[f"ip_adapter.{idx}.to_k_ip.weight"] = (
            rng.standard_normal((inner, ctx_d)).astype(np.float32))
        tensors[f"ip_adapter.{idx}.to_v_ip.weight"] = (
            rng.standard_normal((inner, ctx_d)).astype(np.float32))
    path = str(tmp_path / "ip.safetensors")
    save_file(tensors, path)

    params, cfg = load_ip_adapter_file(path, ucfg)
    assert cfg.n_tokens == 4 and cfg.clip_embed_dim == 16
    assert cfg.context_dim == ctx_d
    # first layer (input block 4 depth 0) carries ip_adapter.1, transposed
    np.testing.assert_allclose(
        np.asarray(params["layers"]["input_blocks"][4][0]["k"]["w"]),
        tensors["ip_adapter.1.to_k_ip.weight"].T,
    )
    # middle block carries the LAST checkpoint entries
    last_idx = 2 * (len(inners) - 1) + 1
    np.testing.assert_allclose(
        np.asarray(params["layers"]["middle_block"][-1]["v"]["w"]),
        tensors[f"ip_adapter.{last_idx}.to_v_ip.weight"].T,
    )

    with pytest.raises(ValueError, match="context dim"):
        load_ip_adapter_file(
            path, dataclasses.replace(ucfg, context_dim=ctx_d * 2))


def _tiny_pipe():
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )


def test_pipeline_ip_adapter_scale_and_identity():
    """scale=0 reproduces the image-free output (ip_v is zero, attention
    over zero values adds zero); scale>0 changes it; DDIM and euler;
    previews bit-match the unsegmented guided run."""
    pipe = _tiny_pipe()
    ucfg = pipe.diffuser_cfg.unet_config()
    ip_cfg = IPAdapterConfig(clip_embed_dim=16,
                             context_dim=ucfg.context_dim, n_tokens=4)
    adapter = init_ip_adapter(jax.random.PRNGKey(0), ucfg, ip_cfg,
                              jnp.float32)
    adapter["layers"] = organize_ip_layers(adapter["layers"], ucfg)
    pipe.ip_adapter_params = adapter
    pipe.ip_adapter_cfg = ip_cfg
    pipe.ip_vision_params = init_clip_vision(jax.random.PRNGKey(1),
                                             TINY_VISION, jnp.float32)
    pipe.ip_vision_cfg = TINY_VISION

    img = (np.random.default_rng(0).random((40, 40, 3)) * 255).astype(
        np.uint8)
    kw = dict(resolution=(64, 64), n_steps=2, seed=5, profile_stages=False)
    base = pipe.txt2img("a cat", **kw)
    off = pipe.txt2img("a cat", ip_adapter_image=img, ip_adapter_scale=0.0,
                       **kw)
    np.testing.assert_allclose(base.astype(int), off.astype(int), atol=1)
    on = pipe.txt2img("a cat", ip_adapter_image=img, ip_adapter_scale=1.0,
                      **kw)
    assert np.abs(on.astype(int) - base.astype(int)).max() > 1

    on_e = pipe.txt2img("a cat", sampler="euler", ip_adapter_image=img,
                        ip_adapter_scale=1.0, **kw)
    base_e = pipe.txt2img("a cat", sampler="euler", **kw)
    assert np.abs(on_e.astype(int) - base_e.astype(int)).max() > 1

    frames = []
    on_prev = pipe.txt2img(
        "a cat", ip_adapter_image=img, ip_adapter_scale=1.0,
        preview_every=1,
        preview_callback=lambda d, t, rgb: frames.append(d), **kw,
    )
    np.testing.assert_array_equal(on, on_prev)
    assert frames

    # unloaded pipeline rejects the argument with a clear error
    pipe2 = _tiny_pipe()
    with pytest.raises(ValueError, match="no IP-Adapter"):
        pipe2.txt2img("x", ip_adapter_image=img, **kw)


def _plus_tensors(rng, embedding_dim, out_ctx, dim=32, n_q=4, depth=2,
                  inner=128):
    """Random official-layout 'plus' (Resampler) image_proj tensors.
    inner=128 -> heads=2 at the fixed dim_head=64."""
    def w(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    t = {
        "image_proj.latents": w(1, n_q, dim),
        "image_proj.proj_in.weight": w(dim, embedding_dim),
        "image_proj.proj_in.bias": w(dim),
        "image_proj.proj_out.weight": w(out_ctx, dim),
        "image_proj.proj_out.bias": w(out_ctx),
        "image_proj.norm_out.weight": 1.0 + w(out_ctx),
        "image_proj.norm_out.bias": w(out_ctx),
    }
    for i in range(depth):
        a = f"image_proj.layers.{i}.0"
        f = f"image_proj.layers.{i}.1"
        t[f"{a}.norm1.weight"] = 1.0 + w(dim)
        t[f"{a}.norm1.bias"] = w(dim)
        t[f"{a}.norm2.weight"] = 1.0 + w(dim)
        t[f"{a}.norm2.bias"] = w(dim)
        t[f"{a}.to_q.weight"] = w(inner, dim)
        t[f"{a}.to_kv.weight"] = w(2 * inner, dim)
        t[f"{a}.to_out.weight"] = w(dim, inner)
        t[f"{f}.0.weight"] = 1.0 + w(dim)
        t[f"{f}.0.bias"] = w(dim)
        t[f"{f}.1.weight"] = w(4 * dim, dim)
        t[f"{f}.3.weight"] = w(dim, 4 * dim)
    return t


def _torch_resampler(t, x_np, heads):
    """Literal transcription of the official Resampler/PerceiverAttention/
    FeedForward forward passes (tencent-ailab/IP-Adapter resampler.py)."""
    import math

    import torch.nn.functional as F

    def T(k):
        return torch.from_numpy(t[k])

    x = torch.from_numpy(x_np)
    latents = T("image_proj.latents").repeat(x.size(0), 1, 1)
    x = x @ T("image_proj.proj_in.weight").t() + T("image_proj.proj_in.bias")

    def lnorm(v, prefix):
        return F.layer_norm(v, v.shape[-1:], T(f"{prefix}.weight"),
                            T(f"{prefix}.bias"))

    i = 0
    while f"image_proj.layers.{i}.0.to_q.weight" in t:
        a = f"image_proj.layers.{i}.0"
        f = f"image_proj.layers.{i}.1"
        xn = lnorm(x, f"{a}.norm1")
        ln_ = lnorm(latents, f"{a}.norm2")
        b, l, _ = ln_.shape
        q = ln_ @ T(f"{a}.to_q.weight").t()
        kv = torch.cat((xn, ln_), dim=-2) @ T(f"{a}.to_kv.weight").t()
        k, v = kv.chunk(2, dim=-1)

        def heads_(z):
            return z.reshape(z.shape[0], z.shape[1], heads, -1
                             ).transpose(1, 2)

        q, k, v = heads_(q), heads_(k), heads_(v)
        dim_head = q.shape[-1]
        scale = 1 / math.sqrt(math.sqrt(dim_head))
        weight = (q * scale) @ (k * scale).transpose(-2, -1)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        out = (weight @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
        latents = out @ T(f"{a}.to_out.weight").t() + latents
        h = lnorm(latents, f"{f}.0")
        h = F.gelu(h @ T(f"{f}.1.weight").t())
        latents = h @ T(f"{f}.3.weight").t() + latents
        i += 1
    out = (latents @ T("image_proj.proj_out.weight").t()
           + T("image_proj.proj_out.bias"))
    return lnorm(out, "image_proj.norm_out").numpy()


def test_resampler_matches_official_transcription(tmp_path):
    """'plus' variant: the loaded Resampler must reproduce a literal torch
    transcription of the official forward (perceiver attention over
    concat(x, latents), double-sqrt scaling, residual FF) — and the
    loader must infer (dim, depth, heads, n_tokens) from the weights."""
    from safetensors.numpy import save_file

    from sdxl_tpu.io.ip_adapter import load_ip_adapter_file
    from sdxl_tpu.models.ip_adapter import resampler_tokens
    from sdxl_tpu.models.unet import unet_block_plan
    from tests.test_sampler import TINY_BASE

    ucfg = TINY_BASE.unet_config()
    rng = np.random.default_rng(8)
    t = _plus_tensors(rng, embedding_dim=32, out_ctx=ucfg.context_dim)
    in_plan, mid, out_plan = unet_block_plan(ucfg)
    j = 0
    for spec in ([s for s in in_plan if s.kind.startswith("res_t")]
                 + [s for s in out_plan if s.kind.startswith("res_t")]
                 + [mid]):
        for _ in range(spec.depth):
            t[f"ip_adapter.{2 * j + 1}.to_k_ip.weight"] = (
                rng.standard_normal((spec.ch_out, ucfg.context_dim))
                .astype(np.float32))
            t[f"ip_adapter.{2 * j + 1}.to_v_ip.weight"] = (
                rng.standard_normal((spec.ch_out, ucfg.context_dim))
                .astype(np.float32))
            j += 1
    path = str(tmp_path / "ip_plus.safetensors")
    save_file(t, path)

    params, cfg = load_ip_adapter_file(path, ucfg)
    assert cfg.variant == "resampler"
    assert (cfg.n_tokens, cfg.dim, cfg.depth, cfg.heads) == (4, 32, 2, 2)
    assert cfg.clip_embed_dim == 32 and cfg.context_dim == ucfg.context_dim

    hidden = rng.standard_normal((2, 5, 32)).astype(np.float32)
    ours = resampler_tokens(params["image_proj"], cfg, jnp.asarray(hidden))
    ref = _torch_resampler(t, hidden, heads=2)
    assert ours.shape == (2, 4, ucfg.context_dim)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-5)


def test_pipeline_plus_variant_end_to_end(tmp_path):
    """Plus adapter through the real pipeline: penultimate-hidden path,
    zero-pixel uncond, scale effect."""
    from safetensors.numpy import save_file

    from sdxl_tpu.io.ip_adapter import load_ip_adapter_file
    from sdxl_tpu.models.unet import unet_block_plan

    pipe = _tiny_pipe()
    ucfg = pipe.diffuser_cfg.unet_config()
    rng = np.random.default_rng(9)
    t = _plus_tensors(rng, embedding_dim=TINY_VISION.n_state,
                      out_ctx=ucfg.context_dim)
    in_plan, mid, out_plan = unet_block_plan(ucfg)
    j = 0
    for spec in ([s for s in in_plan if s.kind.startswith("res_t")]
                 + [s for s in out_plan if s.kind.startswith("res_t")]
                 + [mid]):
        for _ in range(spec.depth):
            for kk in ("to_k_ip", "to_v_ip"):
                t[f"ip_adapter.{2 * j + 1}.{kk}.weight"] = (
                    rng.standard_normal((spec.ch_out, ucfg.context_dim))
                    .astype(np.float32) * 0.05)
            j += 1
    path = str(tmp_path / "ip_plus.safetensors")
    save_file(t, path)
    params, cfg = load_ip_adapter_file(path, ucfg)
    pipe.ip_adapter_params, pipe.ip_adapter_cfg = params, cfg
    pipe.ip_vision_params = init_clip_vision(jax.random.PRNGKey(1),
                                             TINY_VISION, jnp.float32)
    pipe.ip_vision_cfg = TINY_VISION

    img = (np.random.default_rng(0).random((40, 40, 3)) * 255).astype(
        np.uint8)
    kw = dict(resolution=(64, 64), n_steps=2, seed=5, profile_stages=False)
    base = pipe.txt2img("a cat", **kw)
    off = pipe.txt2img("a cat", ip_adapter_image=img, ip_adapter_scale=0.0,
                       **kw)
    np.testing.assert_allclose(base.astype(int), off.astype(int), atol=1)
    on = pipe.txt2img("a cat", ip_adapter_image=img, ip_adapter_scale=1.0,
                      **kw)
    assert np.abs(on.astype(int) - base.astype(int)).max() > 1


def test_ip_with_stacked_transformer_scan_matches_unrolled():
    """merge_ip_kv must produce the stacked (leading-depth-axis) layout
    when the UNet runs its transformer stacks as a lax.scan."""
    from sdxl_tpu.models.unet import (
        init_unet,
        stack_unet_transformers,
        unet_forward,
    )
    from tests.test_sampler import TINY_BASE

    ucfg = TINY_BASE.unet_config()
    params = init_unet(jax.random.PRNGKey(0), ucfg, jnp.float32)
    ip_cfg = IPAdapterConfig(clip_embed_dim=16,
                             context_dim=ucfg.context_dim, n_tokens=4)
    adapter = init_ip_adapter(jax.random.PRNGKey(2), ucfg, ip_cfg,
                              jnp.float32)
    tree = organize_ip_layers(adapter["layers"], ucfg)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.full((1,), 400.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, ucfg.context_dim)),
                      jnp.float32)
    label = jnp.asarray(rng.standard_normal((1, ucfg.adm_in_channels)),
                        jnp.float32)
    tok = jnp.asarray(rng.standard_normal((1, 4, ucfg.context_dim)),
                      jnp.float32)

    kv = merge_ip_kv(precompute_cross_kv(params, ucfg, ctx), tree, tok, 0.8)
    plain = unet_forward(params, ucfg, x, t, ctx, label, cross_kv=kv)

    stacked_params = stack_unet_transformers(params, min_depth=1)
    kv_s = merge_ip_kv(precompute_cross_kv(stacked_params, ucfg, ctx),
                       tree, tok, 0.8)
    stacked = unet_forward(stacked_params, ucfg, x, t, ctx, label,
                           cross_kv=kv_s)
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
