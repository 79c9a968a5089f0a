"""stack_unet_transformers: scanned stacks must equal unrolled lists."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.models.unet import (
    init_unet,
    stack_unet_transformers,
    unet_forward,
)
from sdxl_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from tests.test_unet import TINY


def _inputs(batch=2):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((batch, 16, 16, 4)), jnp.float32)
    t = jnp.full((batch,), 321, jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((batch, 7, TINY.context_dim)), jnp.float32)
    label = jnp.asarray(
        rng.standard_normal((batch, TINY.adm_in_channels)), jnp.float32
    )
    return x, t, ctx, label


def test_stacked_equals_unrolled():
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    stacked = stack_unet_transformers(params, min_depth=2)  # stack depth-2 mid
    x, t, ctx, label = _inputs()
    ref = unet_forward(params, TINY, x, t, ctx, label)
    got = unet_forward(stacked, TINY, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_stacking_is_idempotent_and_selective():
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    stacked = stack_unet_transformers(params, min_depth=2)
    # depth-1 stacks stay lists; depth-2 middle becomes a stacked dict
    assert isinstance(stacked["input_blocks"][4]["transformer"]["blocks"], list)
    mid = stacked["middle_block"]["transformer"]["blocks"]
    assert isinstance(mid, dict)
    assert mid["attn1"]["q"]["w"].shape[0] == 2  # depth axis
    again = stack_unet_transformers(stacked, min_depth=2)
    got = again["middle_block"]["transformer"]["blocks"]["attn1"]["q"]["w"]
    assert got.shape == mid["attn1"]["q"]["w"].shape


def test_stacked_tp_sharding_matches():
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    stacked = stack_unet_transformers(params, min_depth=2)
    x, t, ctx, label = _inputs(batch=4)
    ref = unet_forward(params, TINY, x, t, ctx, label)

    mesh = make_mesh(n_data=2, n_model=4)
    p_sh = shard_params(stacked, mesh, tensor_parallel=True, head_channels=8)
    # stacked 3-D leaf must shard on the model axis (trailing dim)
    qw = p_sh["middle_block"]["transformer"]["blocks"]["attn1"]["q"]["w"]
    shapes = {s.data.shape for s in qw.addressable_shards}
    assert shapes == {(qw.shape[0], qw.shape[1], qw.shape[2] // 4)}

    args = shard_batch((x, t, ctx, label), mesh)
    out = jax.jit(lambda p, a, b, c, d: unet_forward(p, TINY, a, b, c, d))(
        p_sh, *args
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
