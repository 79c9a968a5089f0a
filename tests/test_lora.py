"""LoRA loading/merging tests (io/lora.py).

Covers the three on-disk key conventions (kohya underscored in both
diffusers and sgm/ldm module naming, and peft dotted), linear + conv
adapters, text-encoder towers, and the merge math
W += scale * alpha/r * up@down (transposed into our [in,out] layout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import CLIPConfig, UNetConfig
from sdxl_tpu.io.lora import (
    LoRAEntry,
    apply_lora,
    apply_lora_files,
    parse_lora_tensors,
)
from sdxl_tpu.models.clip import init_clip
from sdxl_tpu.models.unet import init_unet, unet_forward

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


def _lora_pair(rng, d_out, d_in, r=2):
    down = rng.standard_normal((r, d_in)).astype(np.float32) * 0.1
    up = rng.standard_normal((d_out, r)).astype(np.float32) * 0.1
    return down, up


def test_parse_and_canonicalize_all_formats():
    rng = np.random.default_rng(0)
    down, up = _lora_pair(rng, 8, 8)
    tensors = {
        # kohya, ldm module naming
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.alpha": np.float32(1.0),
        # peft, diffusers module naming
        "unet.mid_block.attentions.0.transformer_blocks.1.ff.net.0.proj.lora_A.weight": down,
        "unet.mid_block.attentions.0.transformer_blocks.1.ff.net.0.proj.lora_B.weight": up,
        # text encoder, kohya
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
        # junk
        "not_a_lora_key": down,
    }
    entries, bad = parse_lora_tensors(tensors)
    assert set(entries) == {
        "unet%input_blocks_4_1_transformer_blocks_0_attn1_to_q",
        "unet%mid_block_attentions_0_transformer_blocks_1_ff_net_0_proj",
        "te1%text_model_encoder_layers_0_self_attn_q_proj",
    }
    assert bad == ["not_a_lora_key"]
    assert entries[
        "unet%input_blocks_4_1_transformer_blocks_0_attn1_to_q"
    ].alpha == 1.0
    # peft carries no alpha -> None -> alpha defaults to rank at delta time
    e = entries["unet%mid_block_attentions_0_transformer_blocks_1_ff_net_0_proj"]
    assert e.alpha is None
    np.testing.assert_allclose(e.delta(1.0), up @ down, rtol=1e-6)


def test_merge_math_and_equivalent_namings():
    """kohya-ldm and peft-diffusers keys addressing the same module merge
    into the same leaf; delta = scale*(alpha/r)*up@down lands transposed."""
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    # level-1 first transformer block: input_blocks[4] (1 + 3*1 + 0)
    leaf = params["input_blocks"][4]["transformer"]["blocks"][0]["attn1"]["q"]
    w0 = np.asarray(leaf["w"]).copy()
    d = w0.shape[0]

    rng = np.random.default_rng(1)
    down, up = _lora_pair(rng, d, d, r=4)
    alpha = 2.0

    entries, _ = parse_lora_tensors({
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.alpha": np.float32(alpha),
    })
    stats = apply_lora(entries, unet=params, scale=0.5)
    assert stats["applied"] and not stats["skipped"]

    expected = w0 + (0.5 * (alpha / 4) * (up @ down)).T
    got = np.asarray(
        params["input_blocks"][4]["transformer"]["blocks"][0]["attn1"]["q"]["w"]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    # same module via diffusers naming: down_blocks.1.attentions.0
    entries2, _ = parse_lora_tensors({
        "unet.down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down,
        "unet.down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up,
    })
    params2 = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    stats2 = apply_lora(entries2, unet=params2, scale=0.5)
    assert stats2["applied"]
    got2 = np.asarray(
        params2["input_blocks"][4]["transformer"]["blocks"][0]["attn1"]["q"]["w"]
    )
    # peft alpha defaults to rank -> alpha/r = 1; kohya run used alpha/r = 0.5
    expected2 = w0 + (0.5 * (up @ down)).T
    np.testing.assert_allclose(got2, expected2, rtol=1e-5, atol=1e-6)


def test_output_and_middle_and_resnet_paths():
    params = init_unet(jax.random.PRNGKey(2), TINY, jnp.float32)
    rng = np.random.default_rng(3)

    # up_blocks.0.attentions.2 -> output_blocks[2] (deepest level first)
    leaf = params["output_blocks"][2]["transformer"]["blocks"][0]["attn2"]["out"]
    d_out = leaf["w"].shape[1]
    d_in = leaf["w"].shape[0]
    down_a, up_a = _lora_pair(rng, d_out, d_in)

    # conv adapter (LoCon-style) on a res block: input_blocks[1].res.conv_in
    cw = params["input_blocks"][1]["res"]["conv_in"]["w"]  # HWIO [3,3,32,32]
    r = 2
    conv_down = rng.standard_normal((r, cw.shape[2], 3, 3)).astype(np.float32) * 0.1
    conv_up = rng.standard_normal((cw.shape[3], r, 1, 1)).astype(np.float32) * 0.1

    # time_emb_proj linear on middle_block res2 (diffusers naming)
    lin = params["middle_block"]["res2"]["lin_embed"]["w"]
    down_t, up_t = _lora_pair(rng, lin.shape[1], lin.shape[0])

    entries, _ = parse_lora_tensors({
        "lora_unet_up_blocks_0_attentions_2_transformer_blocks_0_attn2_to_out_0.lora_down.weight": down_a,
        "lora_unet_up_blocks_0_attentions_2_transformer_blocks_0_attn2_to_out_0.lora_up.weight": up_a,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight": conv_down,
        "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight": conv_up,
        "lora_unet_mid_block_resnets_1_time_emb_proj.lora_down.weight": down_t,
        "lora_unet_mid_block_resnets_1_time_emb_proj.lora_up.weight": up_t,
    })
    w_attn0 = np.asarray(leaf["w"]).copy()
    w_conv0 = np.asarray(cw).copy()
    stats = apply_lora(entries, unet=params)
    assert sorted(stats["applied"]) == sorted([
        "unet%up_blocks_0_attentions_2_transformer_blocks_0_attn2_to_out_0",
        "unet%down_blocks_0_resnets_0_conv1",
        "unet%mid_block_resnets_1_time_emb_proj",
    ])
    np.testing.assert_allclose(
        np.asarray(
            params["output_blocks"][2]["transformer"]["blocks"][0]["attn2"]["out"]["w"]
        ),
        w_attn0 + (up_a @ down_a).T,
        rtol=1e-5, atol=1e-6,
    )
    conv_delta = np.einsum("or,rihw->oihw", conv_up[:, :, 0, 0], conv_down)
    np.testing.assert_allclose(
        np.asarray(params["input_blocks"][1]["res"]["conv_in"]["w"]),
        w_conv0 + np.transpose(conv_delta, (2, 3, 1, 0)),
        rtol=1e-5, atol=1e-6,
    )


def test_text_encoder_towers():
    cfg = CLIPConfig(n_vocab=64, n_state=32, embed_dim=32, n_head=4, n_ctx=16,
                     n_layer=2)
    te1 = init_clip(jax.random.PRNGKey(0), cfg)
    te2 = init_clip(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(4)
    down, up = _lora_pair(rng, 32, 32)
    d2, u2 = _lora_pair(rng, cfg.n_state * 4, 32)

    entries, _ = parse_lora_tensors({
        "lora_te1_text_model_encoder_layers_0_self_attn_v_proj.lora_down.weight": down,
        "lora_te1_text_model_encoder_layers_0_self_attn_v_proj.lora_up.weight": up,
        "text_encoder_2.text_model.encoder.layers.1.mlp.fc1.lora_A.weight": d2,
        "text_encoder_2.text_model.encoder.layers.1.mlp.fc1.lora_B.weight": u2,
    })
    w1 = np.asarray(te1["blocks"][0]["attn"]["v"]["w"]).copy()
    w2 = np.asarray(te2["blocks"][1]["mlp"]["fc1"]["w"]).copy()
    stats = apply_lora(entries, te1=te1, te2=te2)
    assert len(stats["applied"]) == 2 and not stats["skipped"]
    np.testing.assert_allclose(
        np.asarray(te1["blocks"][0]["attn"]["v"]["w"]), w1 + (up @ down).T,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(te2["blocks"][1]["mlp"]["fc1"]["w"]), w2 + (u2 @ d2).T,
        rtol=1e-5, atol=1e-6)


def test_skip_bookkeeping_and_shape_guard():
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    rng = np.random.default_rng(5)
    down, up = _lora_pair(rng, 8, 8)
    # resolvable name but no te tree passed -> skipped
    entries, _ = parse_lora_tensors({
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
        # index out of range for the tiny plan -> skipped
        "lora_unet_input_blocks_40_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_40_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
    })
    stats = apply_lora(entries, unet=params)
    assert len(stats["skipped"]) == 2 and not stats["applied"]

    # wrong-dimension adapter raises with the module named
    bad, _ = parse_lora_tensors({
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
    })
    with pytest.raises(ValueError, match="attn1_to_q"):
        apply_lora(bad, unet=params)


def test_lora_changes_unet_forward(tmp_path):
    """End-to-end: a LoRA file written to disk, loaded via apply_lora_files,
    changes the UNet output."""
    from safetensors.numpy import save_file

    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16), jnp.float32)
    label = jax.random.normal(jax.random.PRNGKey(3), (1, 24), jnp.float32)
    y0 = unet_forward(params, TINY, x, t, ctx, label)

    rng = np.random.default_rng(6)
    down, up = _lora_pair(rng, 128, 128)  # level-2 ch = 32*4 = 128
    path = tmp_path / "adapter.safetensors"
    save_file({
        "lora_unet_input_blocks_7_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_7_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_7_1_transformer_blocks_0_attn1_to_q.alpha": np.array(2.0, np.float32),
    }, str(path))

    apply_lora_files([(str(path), 1.0)], unet=params)
    y1 = unet_forward(params, TINY, x, t, ctx, label)
    assert float(jnp.max(jnp.abs(y1 - y0))) > 1e-5
    assert not bool(jnp.any(jnp.isnan(y1)))


def test_load_pipeline_with_lora(tmp_path, tokenizer_dir):
    """Loader integration: --lora-style merge happens before qkv fusion and
    lands in the loaded pipeline's UNet params."""
    import os

    from safetensors.numpy import save_file

    from sdxl_tpu.configs import (
        AutoencoderConfig,
        CLIPConfig,
        DiffuserConfig,
        EmbedderConfig,
        LatentDecoderConfig,
        save_cfg,
    )
    from sdxl_tpu.io import checkpoint as ckpt
    from sdxl_tpu.models.vae import init_autoencoder
    from sdxl_tpu.pipeline.loader import load_pipeline
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod

    e_cfg = EmbedderConfig(
        clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2),
        open_clip_config=CLIPConfig(
            n_state=32, embed_dim=32, n_head=4, n_layer=2, quick_gelu=False
        ),
    )
    d_cfg = DiffuserConfig(
        adm_in_channels=32 + 6 * 256, model_channels=32,
        channel_mults=(1, 2, 4), num_head_channels=8,
        transformer_depths=(1, 1, 1), context_dim=64,
    )
    tiny_vae = AutoencoderConfig(
        encoder_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
        decoder_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = str(tmp_path / "ckpt")
    os.makedirs(out)
    ckpt.save_native(
        os.path.join(out, "embedder.safetensors"),
        {
            "clip": init_clip(keys[0], e_cfg.clip_config),
            "open_clip": init_clip(keys[1], e_cfg.open_clip_config),
        },
    )
    save_cfg(os.path.join(out, "embedder.cfg"), e_cfg)
    ckpt.save_native(
        os.path.join(out, "diffuser.safetensors"),
        init_unet(keys[2], d_cfg.unet_config(), jnp.float32),
    )
    save_cfg(os.path.join(out, "diffuser.cfg"), d_cfg)
    ckpt.save_native(
        os.path.join(out, "alphas_cumprod.safetensors"),
        {"alphas_cumprod": scaled_linear_alphas_cumprod()},
    )
    ckpt.save_native(
        os.path.join(out, "latent_decoder.safetensors"),
        init_autoencoder(keys[3], tiny_vae),
    )
    save_cfg(os.path.join(out, "latent_decoder.cfg"), LatentDecoderConfig())

    # ff proj on input_blocks[4] (level-1 transformer) + a te1 module
    rng = np.random.default_rng(8)
    d_model = 64  # level-1 ch = 32*2
    down_u, up_u = _lora_pair(rng, d_model * 4 * 2, d_model)  # GEGLU proj
    down_t, up_t = _lora_pair(rng, 32, 32)
    lora_path = str(tmp_path / "style.safetensors")
    save_file({
        "lora_unet_input_blocks_4_1_transformer_blocks_0_ff_net_0_proj.lora_down.weight": down_u,
        "lora_unet_input_blocks_4_1_transformer_blocks_0_ff_net_0_proj.lora_up.weight": up_u,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down_t,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up_t,
    }, lora_path)

    base = load_pipeline(out, compute_dtype=jnp.float32,
                         tokenizer_dir=tokenizer_dir, stack_transformers=False)
    with_lora = load_pipeline(out, compute_dtype=jnp.float32,
                              tokenizer_dir=tokenizer_dir,
                              stack_transformers=False,
                              loras=[(lora_path, 0.7)])

    w_b = np.asarray(
        base.unet_params["input_blocks"][4]["transformer"]["blocks"][0]["mlp"]["proj"]["w"]
    )
    w_l = np.asarray(
        with_lora.unet_params["input_blocks"][4]["transformer"]["blocks"][0]["mlp"]["proj"]["w"]
    )
    np.testing.assert_allclose(w_l, w_b + 0.7 * (up_u @ down_u).T,
                               rtol=1e-5, atol=1e-6)
    # text tower touched too
    q_b = np.asarray(base.embedder_params["clip"]["blocks"][0]["attn"]["q"]["w"])
    q_l = np.asarray(
        with_lora.embedder_params["clip"]["blocks"][0]["attn"]["q"]["w"]
    )
    np.testing.assert_allclose(q_l, q_b + 0.7 * (up_t @ down_t).T,
                               rtol=1e-5, atol=1e-6)


def test_apply_lora_files_raises_when_nothing_matches(tmp_path):
    from safetensors.numpy import save_file

    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    rng = np.random.default_rng(7)
    down, up = _lora_pair(rng, 8, 8)
    path = tmp_path / "te_only.safetensors"
    save_file({
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te1_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
    }, str(path))
    with pytest.raises(ValueError, match="no LoRA modules matched"):
        apply_lora_files([(str(path), 1.0)], unet=params)


# ---------------------------------------------------------------------------
# SD3 / Flux transformer LoRA
# ---------------------------------------------------------------------------


def _entry_pair(key, r, d_in, d_out, seed, alpha=None):
    rng = np.random.default_rng(seed)
    t = {
        f"{key}.lora_A.weight": rng.standard_normal((r, d_in), np.float32),
        f"{key}.lora_B.weight": rng.standard_normal((d_out, r), np.float32),
    }
    if alpha is not None:
        t[f"{key}.alpha"] = np.asarray(alpha, np.float32)
    return t


def test_transformer_lora_diffusers_naming_sd3_and_flux():
    from sdxl_tpu.io.lora import apply_lora, parse_lora_tensors
    from sdxl_tpu.models.flux import init_flux
    from sdxl_tpu.models.mmdit import init_mmdit
    from tests.test_flux import TINY as TINY_FLUX
    from tests.test_mmdit import TINY as TINY_MMDIT

    h = TINY_MMDIT.hidden
    params = init_mmdit(jax.random.PRNGKey(0), TINY_MMDIT, jnp.float32)
    w0 = np.asarray(params["blocks"][0]["attn"]["to_q"]["w"]).copy()
    n0 = np.asarray(params["blocks"][1]["norm1"]["mod"]["w"]).copy()
    tensors = {}
    tensors.update(_entry_pair(
        "transformer.transformer_blocks.0.attn.to_q", 2, h, h, 1, alpha=4))
    tensors.update(_entry_pair(
        "transformer.transformer_blocks.1.norm1.linear", 2, h, 6 * h, 2))
    entries, bad = parse_lora_tensors(tensors)
    assert not bad and len(entries) == 2
    stats = apply_lora(entries, transformer=params, scale=0.5)
    assert len(stats["applied"]) == 2 and not stats["skipped"]
    e = entries["transformer%transformer_blocks_0_attn_to_q"]
    expect = w0 + 0.5 * (4 / 2) * (
        e.up.astype(np.float32) @ e.down.astype(np.float32)).T
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["attn"]["to_q"]["w"]), expect,
        rtol=1e-6)
    assert not np.array_equal(
        np.asarray(params["blocks"][1]["norm1"]["mod"]["w"]), n0)

    # Flux: single-stream block targets
    fh = TINY_FLUX.hidden
    fparams = init_flux(jax.random.PRNGKey(1), TINY_FLUX, jnp.float32)
    tensors = {}
    tensors.update(_entry_pair(
        "transformer.single_transformer_blocks.1.attn.to_k", 2, fh, fh, 3))
    tensors.update(_entry_pair(
        "transformer.single_transformer_blocks.0.proj_out", 2,
        5 * fh, fh, 4))
    entries, bad = parse_lora_tensors(tensors)
    assert not bad
    stats = apply_lora(entries, transformer=fparams)
    assert len(stats["applied"]) == 2 and not stats["skipped"]


def test_flux_lora_bfl_fused_naming_splits_rows():
    """kohya/BFL Flux naming: fused img_attn_qkv and single linear1 deltas
    split EXACTLY onto our separate projections (row slices of up@down)."""
    from sdxl_tpu.io.lora import apply_lora, parse_lora_tensors
    from sdxl_tpu.models.flux import init_flux
    from tests.test_flux import TINY as TINY_FLUX

    h = TINY_FLUX.hidden
    params = init_flux(jax.random.PRNGKey(2), TINY_FLUX, jnp.float32)
    before = {
        nm: np.asarray(params["blocks"][0]["attn"][nm]["w"]).copy()
        for nm in ("to_q", "to_k", "to_v")
    }
    mlp0 = np.asarray(params["single_blocks"][0]["proj_mlp"]["w"]).copy()
    sq0 = np.asarray(
        params["single_blocks"][0]["attn"]["to_q"]["w"]).copy()

    rng = np.random.default_rng(5)
    r = 2
    tensors = {
        "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight":
            rng.standard_normal((r, h), np.float32),
        "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight":
            rng.standard_normal((3 * h, r), np.float32),
        "lora_unet_double_blocks_0_img_attn_qkv.alpha":
            np.asarray(r, np.float32),
        "lora_unet_single_blocks_0_linear1.lora_down.weight":
            rng.standard_normal((r, h), np.float32),
        "lora_unet_single_blocks_0_linear1.lora_up.weight":
            rng.standard_normal((3 * h + 4 * h, r), np.float32),
    }
    entries, bad = parse_lora_tensors(tensors)
    assert not bad and len(entries) == 2
    stats = apply_lora(entries, transformer=params)  # no unet loaded
    assert sorted(stats["applied"]) == [
        "unet%double_blocks_0_img_attn_qkv",
        "unet%single_blocks_0_linear1",
    ] and not stats["skipped"]

    e = entries["unet%double_blocks_0_img_attn_qkv"]
    delta = e.up.astype(np.float32) @ e.down.astype(np.float32)  # [3h, h]
    for j, nm in enumerate(("to_q", "to_k", "to_v")):
        np.testing.assert_allclose(
            np.asarray(params["blocks"][0]["attn"][nm]["w"]),
            before[nm] + delta[j * h:(j + 1) * h].T, rtol=1e-6)
    e1 = entries["unet%single_blocks_0_linear1"]
    d1 = e1.up.astype(np.float32) @ e1.down.astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(params["single_blocks"][0]["proj_mlp"]["w"]),
        mlp0 + d1[3 * h:].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["single_blocks"][0]["attn"]["to_q"]["w"]),
        sq0 + d1[:h].T, rtol=1e-6)


def test_flux_pipeline_lora_changes_output(tmp_path, tokenizer_dir):
    from safetensors.numpy import save_file

    from sdxl_tpu.io.lora import apply_lora_files
    from sdxl_tpu.pipeline.flux import random_flux_pipeline
    from tests.test_flux_loader import (
        TINY_CLIP_L,
        TINY_FLUX_PIPE,
        TINY_FLUX_VAE,
        TINY_T5,
    )

    pipe = random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=TINY_CLIP_L,
        vae_cfg=TINY_FLUX_VAE, t5_cfg=TINY_T5, t5_tokens=16,
        compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir)
    base = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                        guidance_scale=3.5, seed=1)

    h = TINY_FLUX_PIPE.hidden
    rng = np.random.default_rng(9)
    tensors = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight":
            rng.standard_normal((2, h), np.float32) * 0.5,
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight":
            rng.standard_normal((h, 2), np.float32) * 0.5,
        # proj_out delta acts directly on the velocity — guarantees a
        # visible image change on the tiny random model
        "transformer.proj_out.lora_A.weight":
            rng.standard_normal((2, h), np.float32),
        "transformer.proj_out.lora_B.weight":
            rng.standard_normal((16, 2), np.float32),
    }
    f = tmp_path / "style.safetensors"
    save_file(tensors, str(f))
    w0 = np.asarray(pipe.flux_params["blocks"][0]["attn"]["to_q"]["w"],
                    np.float32).copy()
    apply_lora_files([(str(f), 1.0)], transformer=pipe.flux_params,
                     te1=pipe.clip_params)
    w1 = np.asarray(pipe.flux_params["blocks"][0]["attn"]["to_q"]["w"],
                    np.float32)
    assert np.abs(w1 - w0).max() > 0.1  # the merge really landed
    out = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=3.5, seed=1)
    assert not np.array_equal(base, out)
