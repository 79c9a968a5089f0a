"""Full-parameter fine-tuning (train/full.py + finetune_full): master
extraction / template stripping, Adafactor learning, merged export,
ZeRO-1 optimizer-state sharding equivalence on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import (
    AutoencoderConfig,
    CLIPConfig,
    DiffuserConfig,
    EmbedderConfig,
)
from sdxl_tpu.models.unet import init_unet, unet_forward
from sdxl_tpu.pipeline.pipeline import random_pipeline
from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod
from sdxl_tpu.train.full import (
    adafactor_sched,
    full_trainable,
    merge_trained,
    shard_state_zero1,
    wrap_loss_full,
    zero_shardings,
    zero_spec_for,
)
from sdxl_tpu.train.lora import set_leaves
from sdxl_tpu.train.losses import diffusion_loss
from sdxl_tpu.train.step import TrainState, adamw_cosine, make_train_step

D_CFG = DiffuserConfig(
    adm_in_channels=24, model_channels=32, channel_mults=(1, 2),
    num_head_channels=8, transformer_depths=(1, 1), context_dim=48,
    is_refiner=False,
)


@pytest.fixture(scope="module")
def tiny_unet():
    return init_unet(jax.random.PRNGKey(0), D_CFG.unet_config(),
                     jnp.bfloat16)


def _loss_parts(frozen_or_template, dtype=jnp.bfloat16):
    ucfg = D_CFG.unet_config()
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())

    def base_loss(trainable, tmpl, batch, key):
        def apply_fn(tr, x_t, t, bb):
            return unet_forward(
                set_leaves(tmpl, tr), ucfg, x_t.astype(dtype), t,
                bb["ctx"].astype(dtype), bb["label"])
        return diffusion_loss(apply_fn, trainable, alphas, batch, key)

    return base_loss


def _batch(b=2):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    return {
        "latents": jax.random.normal(ks[0], (b, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (b, 7, 48)),
        "label": jax.random.normal(ks[2], (b, 24)),
    }


def test_full_trainable_covers_everything_and_template_strips(tiny_unet):
    master, dtypes, template = full_trainable(tiny_unet)
    n_master = sum(int(np.prod(v.shape)) for v in master.values())
    n_frozen = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(tiny_unet))
    assert n_master == n_frozen            # every float leaf trains
    assert all(v.dtype == jnp.float32 for v in master.values())
    assert all(dt == jnp.bfloat16 for dt in dtypes.values())
    # the template holds no duplicate buffers (all trained leaves None)
    assert not jax.tree.leaves(template) or all(
        l is None for l in jax.tree.leaves(template))
    # re-inserting the cast master reproduces the frozen tower bitwise
    rebuilt = set_leaves(
        template, {s: v.astype(dtypes[s]) for s, v in master.items()})
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(tiny_unet)[0],
            jax.tree_util.tree_flatten_with_path(rebuilt)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_ft_rejects_quantized_tower(tiny_unet):
    from sdxl_tpu.io.quantize import quantize_tree

    q = quantize_tree(tiny_unet, bits=8, min_dim=8)
    with pytest.raises(ValueError, match="QLoRA"):
        full_trainable(q)


def test_adafactor_full_ft_learns_and_merges(tiny_unet):
    master, dtypes, template = full_trainable(tiny_unet)
    loss_fn = wrap_loss_full(_loss_parts(template), dtypes)
    tx = adafactor_sched(1e-3, steps=20)
    state = TrainState.create(master, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))
    batch = _batch()
    losses = []
    for _ in range(8):
        state, loss = step(state, template, batch, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses
    trained = merge_trained(tiny_unet, jax.device_get(state.params), dtypes)
    w0 = np.asarray(tiny_unet["conv_out"]["w"], np.float32)
    w1 = np.asarray(trained["conv_out"]["w"], np.float32)
    assert trained["conv_out"]["w"].dtype == jnp.bfloat16
    assert np.abs(w1 - w0).max() > 0


def test_zero_spec_picks_largest_divisible_dim():
    from jax.sharding import PartitionSpec as P

    assert zero_spec_for((640, 2048), 8) == P(None, "data")
    assert zero_spec_for((2048, 640), 8) == P("data", None)
    assert zero_spec_for((77,), 8) == P()          # nothing divides
    assert zero_spec_for((64,), 8) == P("data")
    assert zero_spec_for((640, 2048), 1) == P()    # no data axis


def test_zero1_sharded_step_equals_replicated(tiny_unet):
    """ZeRO-1 layout (master + optimizer state split over the data axis)
    computes the same update as the replicated step."""
    from sdxl_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    # f32 tower: with bf16 grads, Adam's first step normalizes each grad
    # by its own magnitude, so a 1-ulp cross-device difference on a
    # near-zero gradient flips a whole lr-sized update — a property of
    # Adam step 1, not of the sharding
    f32_unet = jax.tree.map(lambda a: a.astype(jnp.float32), tiny_unet)
    master, dtypes, template = full_trainable(f32_unet)
    loss_fn = wrap_loss_full(_loss_parts(template, jnp.float32), dtypes)
    tx = adamw_cosine(1e-3, steps=4)
    batch = _batch(b=4)

    ref_state = TrainState.create(master, tx)
    ref_step = jax.jit(make_train_step(loss_fn, tx))
    ref_state, ref_loss = ref_step(
        ref_state, template, batch, jax.random.PRNGKey(3))

    state = shard_state_zero1(TrainState.create(master, tx), mesh)
    step = jax.jit(make_train_step(loss_fn, tx),
                   out_shardings=(zero_shardings(state, mesh), None))
    with mesh:
        state, loss = step(state, template, shard_batch(batch, mesh),
                           jax.random.PRNGKey(3))
    jax.block_until_ready(state.params)
    # cross-device reduction order shifts the f32 sums slightly
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=2e-4)
    for k in ("conv_out.w", "time_embed.lin1.w"):
        np.testing.assert_allclose(
            np.asarray(state.params[k]), np.asarray(ref_state.params[k]),
            atol=1e-4, err_msg=k)
    # the optimizer state is actually sharded, not replicated
    mu = jax.tree.leaves(state.opt_state)
    assert any(
        not s.is_fully_replicated
        for s in (l.sharding for l in mu if hasattr(l, "sharding"))
    )


def test_finetune_full_e2e_and_inference(tmp_path):
    """finetune_full on a random tiny pipeline: trained tower swaps into
    the pipe and the sampler runs with it."""
    from sdxl_tpu.train.finetune import (
        EncodedDataset,
        FinetuneConfig,
        finetune_full,
    )

    e_cfg = EmbedderConfig(
        clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4,
                               n_layer=2),
        open_clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4,
                                    n_layer=2, quick_gelu=False),
    )
    d_cfg = DiffuserConfig(
        adm_in_channels=32 + 6 * 256, model_channels=32,
        channel_mults=(1, 2), num_head_channels=8,
        transformer_depths=(1, 1), context_dim=64,
    )
    pipe = random_pipeline(
        seed=0, embedder_cfg=e_cfg, diffuser_cfg=d_cfg,
        vae_cfg=AutoencoderConfig(), compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )
    rng = np.random.default_rng(0)
    data = EncodedDataset(
        latents=rng.standard_normal((3, 8, 8, 4)).astype(np.float32),
        ctx=rng.standard_normal((3, 7, 64)).astype(np.float32),
        label=rng.standard_normal((3, 32 + 6 * 256)).astype(np.float32),
        uncond_ctx=rng.standard_normal((7, 64)).astype(np.float32),
        uncond_label=rng.standard_normal((32 + 6 * 256,)).astype(
            np.float32),
        captions=["a", "b", "c"],
    )
    cfg = FinetuneConfig(full=True, optimizer="adafactor", steps=3,
                         batch_size=2, lr=1e-3, log_every=0,
                         master_dtype="f32")
    before = np.asarray(pipe.unet_params["conv_out"]["w"], np.float32)
    trained = finetune_full(pipe, data, cfg)
    after = np.asarray(trained["conv_out"]["w"], np.float32)
    assert np.abs(after - before).max() > 0
    assert trained["conv_out"]["w"].dtype == pipe.unet_params[
        "conv_out"]["w"].dtype
    # the trained tower drops into the pipeline and samples
    pipe.unet_params = trained
    imgs = pipe.txt2img("a crab", resolution=(64, 64), n_steps=2, seed=0)
    assert imgs.shape[1:] == (64, 64, 3)
