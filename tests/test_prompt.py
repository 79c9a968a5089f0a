"""Prompt emphasis parsing, long-prompt chunking, weighted conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.pipeline.prompt import (
    apply_prompt_weights,
    batch_weighted_tokens,
    encode_weighted_chunks,
    parse_prompt_attention,
)
from sdxl_tpu.tokenizer import ClipTokenizer, tokenize_text


def test_parse_attention_syntax():
    assert parse_prompt_attention("a cat") == [("a cat", 1.0)]
    assert parse_prompt_attention("a (cat)") == [("a ", 1.0), ("cat", 1.1)]
    out = parse_prompt_attention("a ((cat))")
    assert out[1][0] == "cat" and abs(out[1][1] - 1.21) < 1e-9
    assert parse_prompt_attention("(cat:1.5)") == [("cat", 1.5)]
    out = parse_prompt_attention("a [cat]")
    assert out[1][0] == "cat" and abs(out[1][1] - 1 / 1.1) < 1e-9
    # escaped brackets are literal text at weight 1
    assert parse_prompt_attention(r"\(cat\)") == [("(cat)", 1.0)]
    # unbalanced open applies to the tail
    out = parse_prompt_attention("a (cat and dog")
    assert out == [("a ", 1.0), ("cat and dog", 1.1)]
    # mixed
    out = parse_prompt_attention("oil painting of (a (cat:1.4) at) night")
    d = {f: w for f, w in out}
    assert abs(d["a "] - 1.1) < 1e-9
    assert abs(d["cat"] - 1.4 * 1.1) < 1e-9
    assert abs(d[" at"] - 1.1) < 1e-9
    assert d[" night"] == 1.0


def test_plain_prompt_chunks_match_tokenize_text():
    tok = ClipTokenizer()
    for text in ("a photograph of an astronaut riding a horse", "", "a (cat)"):
        plain = text.replace("(", "").replace(")", "")
        ids, w = encode_weighted_chunks(text, tok)
        assert ids.shape == (1, 77) and w.shape == (1, 77)
        np.testing.assert_array_equal(ids[0], tokenize_text(plain, tok))
    # plain text -> all weights 1
    ids, w = encode_weighted_chunks("a dog", tok)
    assert (w == 1.0).all()
    # weighted text -> the cat tokens carry the weight
    ids, w = encode_weighted_chunks("a (cat:1.5)", tok)
    assert (w == 1.5).sum() >= 1 and w[0, 0] == 1.0  # SOT stays 1


def test_long_prompt_spills_into_chunks():
    tok = ClipTokenizer()
    long_text = " ".join(["crab"] * 100)  # 100 content tokens > 75
    ids, w = encode_weighted_chunks(long_text, tok)
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.sot_token and ids[1, 0] == tok.sot_token
    # first chunk is full: 75 content tokens then EOT (for ClipTokenizer
    # pad == EOT, so compare content directly rather than != pad)
    crab = tok.encode("crab", add_sot=False, add_eot=False)[0]
    assert (ids[0, 1:76] == crab).all() and ids[0, 76] == tok.eot_token
    # the remaining 25 content tokens land in chunk 1
    assert (ids[1, 1:26] == crab).all() and ids[1, 26] == tok.eot_token
    assert (ids[1, 27:] == tok.pad_token).all()
    # cap respected
    very_long = " ".join(["crab"] * 1000)
    ids, _ = encode_weighted_chunks(very_long, tok, max_chunks=4)
    assert ids.shape == (4, 77)


def test_batch_weighted_tokens_aligns_uncond():
    tok = ClipTokenizer()
    ids, w, u_ids, u_w, weighted, k = batch_weighted_tokens(
        [" ".join(["crab"] * 100), "a cat"], "plain negative", tok
    )
    assert k == 2
    assert ids.shape == (2, 2, 77) and u_ids.shape == (1, 2, 77)
    assert not weighted  # no emphasis markup anywhere
    _, _, _, _, weighted2, _ = batch_weighted_tokens(
        ["a (cat:1.3)"], "", tok
    )
    assert weighted2


def test_apply_prompt_weights_math():
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4), jnp.float32)
    ones = jnp.ones((2, 8))
    np.testing.assert_allclose(
        np.asarray(apply_prompt_weights(h, ones)), np.asarray(h), rtol=1e-6
    )
    w = ones.at[:, 2].set(2.0)
    out = apply_prompt_weights(h, w)
    a = np.asarray(out)
    # weighted token moved, mean |h| preserved per batch row
    assert not np.allclose(a[:, 2], np.asarray(h)[:, 2])
    np.testing.assert_allclose(
        np.abs(a).mean(axis=(1, 2)),
        np.abs(np.asarray(h)).mean(axis=(1, 2)),
        rtol=1e-5,
    )


def test_conditioning_weighted_and_long(tokenizer_dir):
    """Tiny-embedder integration: plain == reference shape, long prompt
    doubles the context tokens, emphasis changes the context."""
    from sdxl_tpu.models.clip import init_clip
    from sdxl_tpu.pipeline.conditioning import text_to_conditioning
    from sdxl_tpu.tokenizer import OpenClipTokenizer
    from tests.test_pipeline_e2e import TINY_EMBEDDER

    params = {
        "clip": init_clip(jax.random.PRNGKey(0), TINY_EMBEDDER.clip_config),
        "open_clip": init_clip(
            jax.random.PRNGKey(1), TINY_EMBEDDER.open_clip_config
        ),
    }
    ct = ClipTokenizer(tokenizer_dir)
    ot = OpenClipTokenizer(tokenizer_dir)

    plain = text_to_conditioning(
        params, TINY_EMBEDDER, ct, ot, "a cat", resolution=(64, 64)
    )
    assert plain.context_full.shape[1] == 77

    widthc = TINY_EMBEDDER.clip_config.n_state
    widtho = TINY_EMBEDDER.open_clip_config.n_state
    assert plain.context_full.shape[2] == widthc + widtho

    long = text_to_conditioning(
        params, TINY_EMBEDDER, ct, ot, " ".join(["crab"] * 100),
        resolution=(64, 64),
    )
    assert long.context_full.shape[1] == 154
    assert long.unconditional_context_full.shape[1] == 154  # padded to match

    emph = text_to_conditioning(
        params, TINY_EMBEDDER, ct, ot, "a (cat:1.5)", resolution=(64, 64)
    )
    assert emph.context_full.shape == plain.context_full.shape
    assert not np.allclose(
        np.asarray(emph.context_full), np.asarray(plain.context_full)
    )
    # emphasis off -> brackets reach the tokenizer verbatim
    raw = text_to_conditioning(
        params, TINY_EMBEDDER, ct, ot, "a (cat:1.5)", resolution=(64, 64),
        parse_attention=False,
    )
    assert not np.allclose(
        np.asarray(raw.context_full), np.asarray(emph.context_full)
    )


def test_txt2img_with_weighted_long_prompt(tokenizer_dir):
    """Pipeline e2e: a weighted 2-chunk prompt flows through conditioning,
    the DDIM scan (Tk=154 cross-attention) and decode."""
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )
    prompt = "(a crab:1.3) " + " ".join(["on a beach"] * 30)
    img = pipe.txt2img(prompt, resolution=(64, 64), n_steps=1, seed=1)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img.astype(np.float64)).all()
