"""Tiny end-to-end pipeline test: prompt -> uint8 image, all stages."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import (
    AutoencoderConfig,
    CLIPConfig,
    DiffuserConfig,
    EmbedderConfig,
)
from sdxl_tpu.pipeline.pipeline import random_pipeline

TINY_EMBEDDER = EmbedderConfig(
    clip_config=CLIPConfig(
        n_vocab=49408, n_state=32, embed_dim=32, n_head=4, n_ctx=77, n_layer=2,
        quick_gelu=True,
    ),
    open_clip_config=CLIPConfig(
        n_vocab=49408, n_state=32, embed_dim=32, n_head=4, n_ctx=77, n_layer=3,
        quick_gelu=False,
    ),
)

TINY_DIFFUSER = DiffuserConfig(
    adm_in_channels=32 + 6 * 256,  # pooled(32) + 6 sinusoid ints
    model_channels=32,
    channel_mults=(1, 2, 4),
    num_head_channels=8,
    transformer_depths=(1, 1, 2),
    context_dim=64,  # 32 + 32
    is_refiner=False,
)

TINY_REFINER = DiffuserConfig(
    adm_in_channels=32 + 5 * 256,
    model_channels=32,
    channel_mults=(1, 2, 4, 4),
    num_head_channels=8,
    transformer_depths=(1, 1, 1, 1),
    context_dim=32,
    is_refiner=True,
)

TINY_VAE = AutoencoderConfig(
    encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
    decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
    n_group=4,
)


@pytest.fixture(scope="module")
def pipe(tokenizer_dir):
    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        refiner_cfg=TINY_REFINER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def test_txt2img_end_to_end(pipe):
    imgs = pipe.txt2img(
        "a photo of a cat", resolution=(64, 64), n_steps=2, seed=7
    )
    assert imgs.shape == (1, 64, 64, 3)
    assert imgs.dtype == np.uint8
    assert imgs.std() > 0  # not constant


def test_txt2img_seeded_determinism(pipe):
    a = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=3)
    b = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=3)
    np.testing.assert_array_equal(a, b)


def test_txt2img_with_refiner(pipe):
    imgs = pipe.txt2img(
        "a cat", resolution=(64, 64), n_steps=2, seed=1, use_refiner=True
    )
    assert imgs.shape == (1, 64, 64, 3)


def test_inpaint_path(pipe):
    # 1024x1024 is in RESOLUTIONS; build a small fake by monkeypatching the
    # table is overkill — use the real smallest bucket divided... the VAE is
    # resolution-agnostic, so patch validate via a bucket-size reference.
    ref = (np.random.default_rng(0).integers(0, 255, (1, 512, 2048, 3))).astype(
        np.uint8
    )
    # full-size window inpaint at the smallest bucket would be slow; crop the
    # latent path short by using few steps.
    imgs = pipe.inpaint(
        "a cat",
        ref,
        crop_left=0,
        crop_right=256,
        crop_top=0,
        crop_bottom=256,
        n_steps=2,
        seed=5,
    )
    assert imgs.shape == (1, 512, 2048, 3)


def test_inpaint_rejects_bad_resolution(pipe):
    ref = np.zeros((1, 100, 100, 3), np.uint8)
    with pytest.raises(ValueError, match="incompatible"):
        pipe.inpaint("a cat", ref)


def test_batched_prompts_e2e(pipe):
    imgs = pipe.txt2img(["a cat", "a dog"], resolution=(64, 64), n_steps=2)
    assert imgs.shape == (2, 64, 64, 3)


def test_vae_bf16_decode_close_to_f32(pipe):
    """Opt-in bf16 decode must produce images within a few u8 levels."""
    import jax.numpy as jnp

    imgs32 = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=3)
    pipe.vae_dtype = jnp.bfloat16
    try:
        imgs16 = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=3)
    finally:
        pipe.vae_dtype = jnp.float32
    d = np.abs(imgs32.astype(np.int32) - imgs16.astype(np.int32))
    assert d.mean() < 4.0 and d.max() <= 64, (d.mean(), d.max())


def test_negative_prompt_changes_output(pipe):
    """--negative-prompt feeds the uncond tower; '' matches the reference's
    always-empty uncond (mod.rs:704-706), a real negative must change the
    CFG direction and therefore the image."""
    base = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=5)
    neg = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=5,
                       negative_prompt="blurry, deformed")
    assert base.shape == neg.shape
    assert not np.array_equal(base, neg)


@pytest.mark.parametrize("sampler", ["ddim", "dpmpp"])
def test_txt2img_hires_two_pass(pipe, sampler):
    """Hires-fix: base sample at 64, latent-upscaled tail at 128."""
    img = pipe.txt2img_hires(
        "a crab", resolution=(64, 64), hires_scale=2.0, hires_strength=0.4,
        n_steps=2, seed=5, sampler=sampler,
    )
    assert img.shape == (1, 128, 128, 3) and img.dtype == np.uint8
    assert np.isfinite(img.astype(np.float64)).all()
    # deterministic
    img2 = pipe.txt2img_hires(
        "a crab", resolution=(64, 64), hires_scale=2.0, hires_strength=0.4,
        n_steps=2, seed=5, sampler=sampler,
    )
    np.testing.assert_array_equal(img, img2)


def test_txt2img_hires_validation(pipe):
    with pytest.raises(ValueError, match="hires_scale"):
        pipe.txt2img_hires("x", resolution=(64, 64), hires_scale=1.0)
    with pytest.raises(ValueError, match="hires_strength"):
        pipe.txt2img_hires("x", resolution=(64, 64), hires_strength=0.0)


def test_inpainting_specialized_9ch_unet(tokenizer_dir):
    """in_channels=9 models (diffusers *-inpainting): the UNet input is
    [latent | mask | masked-image latent] instead of the pin path."""
    import dataclasses

    cfg9 = dataclasses.replace(TINY_DIFFUSER, in_channels=9)
    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=cfg9, vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32, param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )
    # conv_in really is 9-wide
    assert pipe.unet_params["input_blocks"][0]["conv"]["w"].shape[2] == 9
    pipe.strict_resolutions = False  # tiny 64x64 test sizes

    ref = (np.arange(64 * 64 * 3) % 255).reshape(1, 64, 64, 3).astype(np.uint8)
    for sampler in ("ddim", "euler"):
        out = pipe.inpaint(
            "a crab", ref, crop_left=16, crop_right=48, crop_top=16,
            crop_bottom=48, n_steps=2, seed=4, sampler=sampler,
        )
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
        assert np.isfinite(out.astype(np.float64)).all()
    # deterministic
    a = pipe.inpaint("a crab", ref, crop_left=16, crop_right=48,
                     crop_top=16, crop_bottom=48, n_steps=2, seed=4)
    b = pipe.inpaint("a crab", ref, crop_left=16, crop_right=48,
                     crop_top=16, crop_bottom=48, n_steps=2, seed=4)
    np.testing.assert_array_equal(a, b)
    # the mask actually reaches the model: a different crop window changes
    # the output everywhere (concat channels differ)
    c = pipe.inpaint("a crab", ref, crop_left=0, crop_right=32,
                     crop_top=0, crop_bottom=32, n_steps=2, seed=4)
    assert not np.array_equal(a, c)


def test_preview_segmented_matches_unsegmented(pipe):
    """preview_every segments the DDIM scan; the final image must be
    bit-equal to the one-scan run, and the callback must see monotone
    progress with correctly shaped u8 previews."""
    seen = []

    def cb(done, total, rgb):
        seen.append((done, total, rgb.shape, rgb.dtype))
        assert rgb.dtype == np.uint8 and rgb.shape[-1] == 3

    plain = pipe.txt2img("a crab", resolution=(64, 64), n_steps=4, seed=9)
    seg = pipe.txt2img("a crab", resolution=(64, 64), n_steps=4, seed=9,
                       preview_every=2, preview_callback=cb)
    np.testing.assert_array_equal(plain, seg)
    # 4 steps -> 4 UNet iterations (999,749,499,249); the callback fires
    # between segments, not after the last one
    assert [d for d, _, _, _ in seen] == [2]
    assert all(t == 4 for _, t, _, _ in seen)
    assert seen[0][2] == (1, 8, 8, 3)  # latent-resolution preview


@pytest.mark.parametrize("sampler", ["euler", "dpmpp", "unipc", "heun",
                                     "dpmpp_3m_sde", "dpm2_a", "lms"])
def test_k_preview_segmented_matches_unsegmented(pipe, sampler):
    """Previews generalize to the k-samplers: the segmented scan (with the
    DPM++ multistep history carried across boundaries) must reproduce the
    unsegmented image."""
    seen = []

    def cb(done, total, rgb):
        seen.append((done, total))
        assert rgb.dtype == np.uint8 and rgb.shape == (1, 8, 8, 3)

    plain = pipe.txt2img("a crab", resolution=(64, 64), n_steps=4, seed=9,
                         sampler=sampler, schedule="karras")
    seg = pipe.txt2img("a crab", resolution=(64, 64), n_steps=4, seed=9,
                       sampler=sampler, schedule="karras",
                       preview_every=1, preview_callback=cb)
    # same trajectory; u8 rounding may differ by 1 on isolated pixels from
    # segment-boundary recompilation reordering f32 ops
    d = np.abs(plain.astype(int) - seg.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())
    assert [x for x, _ in seen] == [1, 2, 3]


def test_per_image_seeds_are_batch_position_independent(pipe):
    """seed=[a, b]: image i depends only on seeds[i] — fused serving keeps
    each request's seed. Single-int seed keeps the reference semantics."""
    both = pipe.txt2img(["a cat", "a cat"], resolution=(64, 64), n_steps=2,
                        seed=[11, 22])
    solo_a = pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2,
                          seed=[11])
    solo_b = pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2,
                          seed=[22])
    # batch-2 vs batch-1 executions reorder f32 reductions; allow the
    # resulting off-by-one u8 rounding on isolated pixels
    for got, want in ((both[0], solo_a[0]), (both[1], solo_b[0])):
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())
    assert not np.array_equal(both[0], both[1])

    with pytest.raises(ValueError, match="seeds"):
        pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2, seed=[1, 2])


def test_uncond_conditioning_cache(pipe):
    """The unconditional half depends only on (negative prompt, resolution,
    crop, clip_skip) — cached across requests, bit-identical to a fresh
    computation (VERDICT r2 #4; uncond is always "" in the reference,
    stablediffusion/mod.rs:698-726)."""
    from sdxl_tpu.pipeline.conditioning import text_to_conditioning

    pipe._uncond_cache.clear()
    c1 = pipe.conditioning(["a cat"], (64, 64), profile_stages=False)
    assert len(pipe._uncond_cache) == 1
    # different prompt, same (res, crop, neg) -> hit: same uncond objects
    c2 = pipe.conditioning(["a dog"], (64, 64), profile_stages=False)
    assert len(pipe._uncond_cache) == 1
    assert c2.unconditional_context_full is c1.unconditional_context_full
    assert (c2.unconditional_channel_context_refiner
            is c1.unconditional_channel_context_refiner)
    # cached uncond == cache-less fresh computation, bitwise
    fresh = text_to_conditioning(
        pipe.embedder_params, pipe.embedder_cfg, pipe.clip_tokenizer,
        pipe.open_clip_tokenizer, ["a dog"], (64, 64),
    )
    for f in ("unconditional_context_full", "unconditional_context_open_clip",
              "unconditional_channel_context",
              "unconditional_channel_context_refiner"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c2, f)), np.asarray(getattr(fresh, f)), err_msg=f
        )
    # the conditional half is NOT affected by the cache
    np.testing.assert_array_equal(np.asarray(c2.context_full),
                                  np.asarray(fresh.context_full))
    # resolution / negative prompt / crop are part of the key
    pipe.conditioning(["a cat"], (32, 32), profile_stages=False)
    assert len(pipe._uncond_cache) == 2
    neg = pipe.conditioning(["a cat"], (64, 64), negative_prompt="blurry",
                            profile_stages=False)
    assert len(pipe._uncond_cache) == 3
    assert not np.array_equal(np.asarray(neg.unconditional_context_full),
                              np.asarray(c1.unconditional_context_full))
    pipe.conditioning(["a cat"], (64, 64), crop=(8, 0), profile_stages=False)
    assert len(pipe._uncond_cache) == 4
