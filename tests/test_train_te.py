"""Text-encoder LoRA training (--train-text-encoder, SDXL family).

The kohya dual-tower recipe: the trainable set extends to both CLIP
towers' attention linears, the towers run IN-GRAPH from single-chunk
token ids (pipeline/conditioning._embed_one — the program inference
runs), and gradients flow through the UNet's cross-attention into the
tower factors. Pinned by exact identities: zero-init factors leave the
conditioning AND the loss bitwise at the base; gradients reach the tower
ups; a trained composite exports kohya/peft keys that the inference
--lora merge reproduces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.pipeline.pipeline import random_pipeline
from sdxl_tpu.train.finetune import (
    FinetuneConfig,
    _unet_loss_fn,
    export_adapter,
    sample_batch,
)
from sdxl_tpu.train.lora import init_lora, set_leaves
from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE


@pytest.fixture(scope="module")
def pipe(tokenizer_dir):
    from sdxl_tpu.models.unet import unfuse_unet_qkv

    p = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    # training targets the unfused ecosystem-named projections, exactly
    # like cli/train's load path
    p.unet_params = unfuse_unet_qkv(p.unet_params)
    return p


def _composite(pipe):
    return {"unet": pipe.unet_params,
            "clip": pipe.embedder_params["clip"],
            "open_clip": pipe.embedder_params["open_clip"]}


def _tok_batch(pipe, captions, res=64):
    from sdxl_tpu.tokenizer.bpe import tokenize_text

    n = len(captions)
    n_ctx = pipe.embedder_cfg.clip_config.n_ctx
    size = np.broadcast_to(np.array([[res, res]], np.int32), (n, 2)).copy()
    lat = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (n, res // 8, res // 8, 4)),
        np.float32)
    return {
        "latents": lat,
        "tok_clip": np.asarray(
            [tokenize_text(c, pipe.clip_tokenizer, n_ctx)
             for c in captions], np.int32),
        "tok_oc": np.asarray(
            [tokenize_text(c, pipe.open_clip_tokenizer, n_ctx)
             for c in captions], np.int32),
        "size": size, "crop": np.zeros((n, 2), np.int32),
        "ar": size.copy(),
    }


def test_composite_targets_and_zero_init_identity(pipe):
    """init_lora over the composite tree targets both towers; zero ups
    keep the in-graph conditioning AND the loss bitwise at the base."""
    frozen = _composite(pipe)
    flat = init_lora(frozen, rank=2, key=jax.random.PRNGKey(0))
    towers = {k.split(".", 1)[0] for k in flat}
    assert towers == {"unet", "clip", "open_clip"}

    cfg = FinetuneConfig(train_text_encoder=True, remat=False)
    loss_fn = _unet_loss_fn(pipe, cfg)
    batch = _tok_batch(pipe, ["a crab", "a cat"])
    key = jax.random.PRNGKey(3)
    l_injected = loss_fn(flat, frozen, batch, key)

    # the same loss with factors stripped entirely: identical (up == 0)
    only_unet = {k: v for k, v in flat.items() if False}
    # a zero-factor pass vs a no-factor pass must agree exactly
    l_base = loss_fn(only_unet, frozen, batch, key)
    np.testing.assert_array_equal(np.asarray(l_injected), np.asarray(l_base))


def test_gradients_reach_text_encoder_factors(pipe):
    frozen = _composite(pipe)
    flat = init_lora(frozen, rank=2, key=jax.random.PRNGKey(0))
    cfg = FinetuneConfig(train_text_encoder=True, remat=False)
    loss_fn = _unet_loss_fn(pipe, cfg)
    batch = _tok_batch(pipe, ["a crab"])
    grads = jax.grad(lambda f: loss_fn(f, frozen, batch,
                                       jax.random.PRNGKey(5)))(flat)
    # up factors are the live gradient surface at init (down grads are
    # zero while up == 0 — the standard LoRA init property)
    for tower in ("clip", "open_clip", "unet"):
        ups = [np.abs(np.asarray(g)).max()
               for k, g in grads.items()
               if k.startswith(tower + ".") and k.endswith(".lora_up")]
        assert ups and max(ups) > 0.0, tower


def test_caption_dropout_swaps_token_ids(pipe):
    from sdxl_tpu.train.finetune import EncodedDataset

    n_ctx = pipe.embedder_cfg.clip_config.n_ctx
    from sdxl_tpu.tokenizer.bpe import tokenize_text

    u_tc = np.asarray(tokenize_text("", pipe.clip_tokenizer, n_ctx),
                      np.int32)
    u_to = np.asarray(tokenize_text("", pipe.open_clip_tokenizer, n_ctx),
                      np.int32)
    tok = np.asarray([tokenize_text("a crab", pipe.clip_tokenizer, n_ctx)],
                     np.int32)
    toko = np.asarray(
        [tokenize_text("a crab", pipe.open_clip_tokenizer, n_ctx)],
        np.int32)
    data = EncodedDataset(
        latents=np.zeros((1, 8, 8, 4), np.float32),
        ctx=np.zeros((1, 7, 64), np.float32), label=None,
        uncond_ctx=np.zeros((7, 64), np.float32), uncond_label=None,
        captions=["a crab"], tok_clip=tok, tok_oc=toko,
        uncond_tok_clip=u_tc, uncond_tok_oc=u_to, size_hw=(64, 64),
    )
    rng = np.random.default_rng(0)
    b = sample_batch(data, 4, rng, caption_dropout=1.0)
    np.testing.assert_array_equal(b["tok_clip"],
                                  np.broadcast_to(u_tc, (4, n_ctx)))
    np.testing.assert_array_equal(b["tok_oc"],
                                  np.broadcast_to(u_to, (4, n_ctx)))
    b2 = sample_batch(data, 4, rng, caption_dropout=0.0)
    np.testing.assert_array_equal(b2["tok_clip"],
                                  np.broadcast_to(tok[0], (4, n_ctx)))


@pytest.mark.parametrize("fmt", ["kohya", "peft"])
def test_trained_composite_export_roundtrip(pipe, tmp_path, fmt):
    """Randomized composite factors: runtime-injected conditioning ==
    the inference --lora merge of the exported file (all three towers),
    through the pipeline's own conditioning program."""
    import copy

    from sdxl_tpu.io.lora import apply_lora, load_lora_file
    from tests.test_train_lora import _randomize_ups

    frozen = _composite(pipe)
    flat = _randomize_ups(
        init_lora(frozen, rank=2, key=jax.random.PRNGKey(1)),
        jax.random.PRNGKey(2))
    injected = set_leaves(frozen, flat)

    path = str(tmp_path / f"te_adapter_{fmt}.safetensors")
    export_adapter(path, flat, pipe, fmt=fmt)
    entries = load_lora_file(path)
    assert len(entries) == len(flat) // 2
    if fmt == "kohya":
        # canonical entry keys: tower% + underscored module
        assert any(e.startswith("te1%") for e in entries)
        assert any(e.startswith("te2%") for e in entries)

    merged_unet = copy.deepcopy(jax.tree.map(lambda a: a,
                                             pipe.unet_params))
    merged_clip = copy.deepcopy(jax.tree.map(lambda a: a,
                                             pipe.embedder_params["clip"]))
    merged_oc = copy.deepcopy(
        jax.tree.map(lambda a: a, pipe.embedder_params["open_clip"]))
    res = apply_lora(entries, unet=merged_unet, te1=merged_clip,
                     te2=merged_oc)
    assert not res["skipped"], res["skipped"]
    assert len(res["applied"]) == len(entries)

    saved = pipe.embedder_params
    try:
        pipe.embedder_params = {"clip": injected["clip"],
                                "open_clip": injected["open_clip"]}
        pipe._uncond_cache.clear()
        c_rt = pipe.conditioning(["a crab"], (64, 64),
                                 profile_stages=False)
        pipe.embedder_params = {"clip": merged_clip,
                                "open_clip": merged_oc}
        pipe._uncond_cache.clear()
        c_mg = pipe.conditioning(["a crab"], (64, 64),
                                 profile_stages=False)
    finally:
        pipe.embedder_params = saved
        pipe._uncond_cache.clear()
    np.testing.assert_allclose(np.asarray(c_rt.context_full),
                               np.asarray(c_mg.context_full),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_rt.channel_context),
                               np.asarray(c_mg.channel_context),
                               rtol=2e-5, atol=2e-5)


def test_finetune_lora_te_end_to_end(pipe, tmp_path):
    """Two real optimizer steps with --train-text-encoder semantics:
    finite loss, tower factors actually move, adapter exports."""
    import os

    from PIL import Image

    from sdxl_tpu.train.finetune import encode_dataset, finetune_lora

    ds = tmp_path / "data"
    os.makedirs(ds, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(str(ds / f"img{i}.png"))
        (ds / f"img{i}.txt").write_text("a tiny crab")

    data = encode_dataset(pipe, str(ds), 64, chunk=2)
    assert data.tok_clip is not None and data.size_hw == (64, 64)
    cfg = FinetuneConfig(rank=2, steps=2, batch_size=1, lr=1e-3,
                         te_lr=5e-4, train_text_encoder=True,
                         remat=False, log_every=1)
    factors, _ = finetune_lora(pipe, data, cfg)
    te_ups = [k for k in factors
              if k.startswith(("clip.", "open_clip."))
              and k.endswith(".lora_up")]
    assert te_ups
    moved = max(float(np.abs(np.asarray(factors[k])).max())
                for k in te_ups)
    assert np.isfinite(moved) and moved > 0.0
    export_adapter(str(tmp_path / "te.safetensors"), factors, pipe)


def test_train_text_encoder_rejects_non_dual_tower():
    from sdxl_tpu.train.finetune import finetune_lora

    class FakePipe:
        unet_params = {}
        embedder_cfg = object()

    cfg = FinetuneConfig(train_text_encoder=True)
    with pytest.raises(ValueError, match="dual-tower"):
        finetune_lora(FakePipe(), None, cfg)
