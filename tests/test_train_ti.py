"""Textual-inversion TRAINING (train/textual_inversion.py): placeholder
registration, row init semantics, the jitted train step over the frozen
towers, and the export round-trip through the inference --embedding
loader (io/textual_inversion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.train.textual_inversion import (
    OBJECT_TEMPLATES,
    TIConfig,
    TIDataset,
    encode_ti_dataset,
    export_ti,
    init_ti_rows,
    register_placeholder,
    sample_ti_batch,
    train_textual_inversion,
)


@pytest.fixture()
def tiny_pipe(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


@pytest.fixture()
def dataset_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"img{i}.png")
    return str(tmp_path)


def test_register_and_encode_pseudo_ids(tiny_pipe, dataset_dir):
    cfg = TIConfig(placeholder="<crabto>", n_vectors=2, steps=1)
    ids = register_placeholder(tiny_pipe, cfg)
    base = tiny_pipe.clip_tokenizer.n_base_vocab
    assert ids["clip"] == [base, base + 1]
    assert ids["open_clip"] == [base, base + 1]
    data = encode_ti_dataset(tiny_pipe, dataset_dir, 32, cfg, chunk=2)
    assert data.latents.shape == (3, 4, 4, 4)
    # every template row carries the pseudo ids
    assert data.tokens["clip"].shape == (len(OBJECT_TEMPLATES), 1, 77)
    assert (data.tokens["clip"] >= base).any(axis=(1, 2)).all()
    assert not data.per_image


def test_captions_mode_requires_placeholder(tiny_pipe, dataset_dir):
    cfg = TIConfig(placeholder="<crabto>", templates="captions", steps=1)
    with pytest.raises(ValueError, match="placeholder"):
        encode_ti_dataset(tiny_pipe, dataset_dir, 32, cfg)


def test_init_rows_from_word(tiny_pipe):
    cfg = TIConfig(placeholder="<crabto>", n_vectors=3, init_word="crab")
    register_placeholder(tiny_pipe, cfg)
    rows = init_ti_rows(tiny_pipe, cfg, jax.random.PRNGKey(0))
    ids = tiny_pipe.clip_tokenizer.encode("crab", True, True)
    content = ids[1]
    table = np.asarray(tiny_pipe.embedder_params["clip"]["token_embedding"])
    assert rows["clip"].shape == (3, table.shape[1])
    np.testing.assert_array_equal(np.asarray(rows["clip"][0]),
                                  table[content])
    np.testing.assert_array_equal(np.asarray(rows["clip"][1]),
                                  np.asarray(rows["clip"][0]))
    # random init when no init word: std matches the table's scale-ish
    rows2 = init_ti_rows(
        tiny_pipe, TIConfig(placeholder="<crabto>", n_vectors=3),
        jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(rows2["clip"]),
                           np.asarray(rows["clip"]))


def test_sample_ti_batch_alignment():
    lat = np.arange(4, dtype=np.float32).reshape(4, 1, 1, 1) * np.ones(
        (4, 2, 2, 4), np.float32)
    toks = {"clip": np.tile(np.arange(4)[:, None, None], (1, 1, 7))}
    data = TIDataset(latents=lat, tokens=toks, per_image=True, resolution=16)
    b = sample_ti_batch(data, 8, np.random.default_rng(0))
    # per_image: token row index == latent row index
    assert np.array_equal(b["tok_clip"][:, 0, 0],
                          b["latents"][:, 0, 0, 0].astype(np.int64))


def test_train_and_roundtrip_sdxl(tiny_pipe, dataset_dir, tmp_path,
                                  tokenizer_dir):
    cfg = TIConfig(placeholder="<crabto>", n_vectors=2, init_word="crab",
                   steps=3, batch_size=2, lr=1e-2, remat=False,
                   log_every=0, seed=0)
    data = encode_ti_dataset(tiny_pipe, dataset_dir, 32, cfg, chunk=2)
    init = init_ti_rows(tiny_pipe, cfg, jax.random.PRNGKey(cfg.seed))
    rows = train_textual_inversion(tiny_pipe, data, cfg)
    assert set(rows) == {"clip", "open_clip"}
    assert all(np.isfinite(v).all() for v in rows.values())
    # training moved the rows off their init
    assert not np.allclose(rows["clip"], np.asarray(init["clip"]))

    out = str(tmp_path / "crabto.safetensors")
    export_ti(out, rows)

    # round-trip through the inference --embedding path on a FRESH pipe
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe2 = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir)
    pipe2.add_textual_inversions([out + ":<crabto>"])
    ids = pipe2.clip_tokenizer.register_custom_token("<crabto>", 2)
    table = np.asarray(pipe2.embedder_params["clip"]["token_embedding"])
    np.testing.assert_allclose(table[ids], rows["clip"], atol=1e-6)
    img = pipe2.txt2img("a photo of <crabto>", resolution=(32, 32),
                        n_steps=1, seed=1)
    assert np.isfinite(img.astype(np.float64)).all()


def test_train_sd1(tmp_path, dataset_dir):
    from tests.test_sd1 import _tiny_sd1_pipeline

    pipe = _tiny_sd1_pipeline()
    cfg = TIConfig(placeholder="<sty>", n_vectors=1, templates="style",
                   steps=2, batch_size=1, lr=1e-2, remat=False,
                   log_every=0)
    # resolution 64: the tiny SD1 UNet has 4 levels; a 32px (4x4-latent)
    # input would underflow its downsample path
    data = encode_ti_dataset(pipe, str(dataset_dir), 64, cfg, chunk=2)
    rows = train_textual_inversion(pipe, data, cfg)
    assert set(rows) == {"clip"}
    out = str(tmp_path / "sty.safetensors")
    export_ti(out, rows)
    from safetensors.numpy import load_file

    loaded = load_file(out)
    assert list(loaded) == ["emb_params"]
    np.testing.assert_allclose(loaded["emb_params"], rows["clip"])
