"""CLIP tower structural/behavioral tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.configs import CLIPConfig
from sdxl_tpu.models.clip import clip_hidden, clip_hidden_pooled, init_clip

TINY = CLIPConfig(
    n_vocab=64, n_state=32, embed_dim=24, n_head=4, n_ctx=16, n_layer=3,
    quick_gelu=True,
)


def _params():
    return init_clip(jax.random.PRNGKey(0), TINY)


def test_hidden_shapes():
    params = _params()
    tokens = jnp.zeros((2, 16), dtype=jnp.int32)
    h = clip_hidden(params, TINY, tokens, hidden_idx=2)
    assert h.shape == (2, 16, 32)


def test_hidden_pooled_shapes():
    params = _params()
    tokens = jnp.zeros((2, 16), dtype=jnp.int32)
    h, pooled = clip_hidden_pooled(params, TINY, tokens, hidden_idx=2)
    assert h.shape == (2, 16, 32)
    assert pooled.shape == (2, 24)


def test_causality():
    """Changing a later token must not affect earlier hidden states."""
    params = _params()
    t1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
    t2 = t1.at[0, 6].set(9)
    h1 = clip_hidden(params, TINY, t1, hidden_idx=3)
    h2 = clip_hidden(params, TINY, t2, hidden_idx=3)
    np.testing.assert_allclose(
        np.asarray(h1[:, :6]), np.asarray(h2[:, :6]), atol=1e-6
    )
    assert not np.allclose(np.asarray(h1[:, 6:]), np.asarray(h2[:, 6:]))


def test_eot_pooling_uses_argmax_position():
    """Pooled output reads the position of the max token id (clip/mod.rs:141)."""
    params = _params()
    # EOT (= highest id 63) at position 3 vs position 5, same prefix
    a = jnp.array([[5, 6, 7, 63, 0, 0, 0, 0]], dtype=jnp.int32)
    b = jnp.array([[5, 6, 7, 8, 9, 63, 0, 0]], dtype=jnp.int32)
    _, pa = clip_hidden_pooled(params, TINY, a, hidden_idx=2)
    _, pb = clip_hidden_pooled(params, TINY, b, hidden_idx=2)
    assert not np.allclose(np.asarray(pa), np.asarray(pb))


def test_hidden_idx_stops_early():
    """forward_hidden(idx) must run exactly idx blocks (penultimate trick)."""
    params = _params()
    tokens = jnp.zeros((1, 8), dtype=jnp.int32)
    h0 = clip_hidden(params, TINY, tokens, hidden_idx=0)
    emb = (
        params["token_embedding"][tokens]
        + params["position_embedding"][:8][None]
    )
    np.testing.assert_allclose(np.asarray(h0), np.asarray(emb), atol=1e-6)


def test_jit_compiles():
    params = _params()
    tokens = jnp.zeros((1, 16), dtype=jnp.int32)
    f = jax.jit(lambda p, t: clip_hidden_pooled(p, TINY, t, 2))
    h, pooled = f(params, tokens)
    assert h.shape == (1, 16, 32)
