"""Prompt editing / scheduling (pipeline/prompt_schedule.py +
sampler.scheduled_sample_latent).

Grammar semantics follow A1111's prompt_parser exactly (1-indexed steps,
boundary = int(when*steps) fraction / int(when) absolute, step <= boundary
keeps "from"; alternation picks (step-1) % n). The sampling side is
pinned by exact identities: a single-segment schedule equals the ordinary
one-scan samplers bitwise, and a two-segment DDIM run equals the
head_steps/tail_from expert-split composition of the same conditionings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.pipeline.prompt_schedule import (
    parse_batch_schedule,
    prompt_at_step,
)


# ---------------------------------------------------------------------------
# grammar


def test_fractional_switch():
    # boundary = int(0.5 * 10) = 5: steps 1-5 "a cat", 6-10 "a dog"
    assert prompt_at_step("a [cat:dog:0.5]", 5, 10) == "a cat"
    assert prompt_at_step("a [cat:dog:0.5]", 6, 10) == "a dog"
    segs = parse_batch_schedule(["a [cat:dog:0.5]"], 10)
    assert segs == [(5, ["a cat"]), (5, ["a dog"])]


def test_absolute_switch_and_clamp():
    assert prompt_at_step("[x:y:3]", 3, 10) == "x"
    assert prompt_at_step("[x:y:3]", 4, 10) == "y"
    # boundary clamps to the step count -> never switches, but the
    # RESOLVED prompt must still replace the raw syntax (one segment)
    assert parse_batch_schedule(["[x:y:40]"], 10) == [(10, ["x"])]
    assert parse_batch_schedule(["[x:y:0]"], 10) == [(10, ["y"])]


def test_add_and_remove_forms():
    # [to:when] adds after the boundary; [from::when] removes after it
    assert prompt_at_step("a [mustache:0.5] man", 5, 10) == "a  man"
    assert prompt_at_step("a [mustache:0.5] man", 6, 10) == "a mustache man"
    assert prompt_at_step("[hat::0.5] girl", 5, 10) == "hat girl"
    assert prompt_at_step("[hat::0.5] girl", 6, 10) == " girl"


def test_alternation():
    assert [prompt_at_step("[cow|horse] field", s, 4)
            for s in (1, 2, 3, 4)] == [
        "cow field", "horse field", "cow field", "horse field"]
    segs = parse_batch_schedule(["[cow|horse]"], 4)
    assert segs == [(1, ["cow"]), (1, ["horse"]), (1, ["cow"]),
                    (1, ["horse"])]


def test_attention_brackets_and_parens_untouched():
    # [word] (emphasis weakening) and (word:1.3) must survive for the
    # emphasis parser; a colon-to non-number is not a schedule
    assert prompt_at_step("a [blue] (big:1.3) cat", 1, 10) == \
        "a [blue] (big:1.3) cat"
    assert parse_batch_schedule(["a [blue] (big:1.3) cat"], 10) is None
    assert prompt_at_step("[a:b]", 1, 10) == "[a:b]"


def test_nesting_resolves_innermost_first():
    # steps 1-2: "a"; step 3: alternation picks "b"; step 4: "c"
    assert [prompt_at_step("[a:[b|c]:2]", s, 4) for s in (1, 2, 3, 4)] == \
        ["a", "a", "b", "c"]


def test_batch_union_grid():
    segs = parse_batch_schedule(["[a:b:0.5]", "[c:d:0.25]"], 4)
    assert segs == [(1, ["a", "c"]), (1, ["a", "d"]), (2, ["b", "d"])]


def test_from_field_may_contain_colon():
    # the when is the LAST field; earlier colons belong to the prompt
    assert prompt_at_step("[x:y:z:0.5]", 1, 10) == "x:y"
    assert prompt_at_step("[x:y:z:0.5]", 6, 10) == "z"


# ---------------------------------------------------------------------------
# sampling identities

from sdxl_tpu.models.unet import init_unet  # noqa: E402
from sdxl_tpu.pipeline.sampler import (  # noqa: E402
    diffuse_latent,
    euler_sample_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
    scheduled_sample_latent,
)
from tests.test_sampler import TINY_BASE, _cond  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    return params, alphas


def test_single_segment_equals_plain_samplers(setup):
    params, alphas = setup
    cond = _cond(batch=1)
    key = jax.random.PRNGKey(5)
    a = scheduled_sample_latent(params, TINY_BASE, alphas, [cond], [4], key,
                                7.5, 4, jnp.float32, method="ddim")
    b = sample_latent(params, TINY_BASE, alphas, cond, key, 7.5, 4,
                      jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for method in ("euler", "dpmpp", "euler_a", "unipc", "heun",
                   "dpmpp_3m_sde"):
        a = scheduled_sample_latent(params, TINY_BASE, alphas, [cond], [4],
                                    key, 7.5, 4, jnp.float32, method=method)
        b = euler_sample_latent(params, TINY_BASE, alphas, cond, key, 7.5, 4,
                                jnp.float32, method=method)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=method)


def test_two_segment_ddim_equals_head_tail_composition(setup):
    """The prompt switch must slice the ONE schedule exactly like the
    expert split does: scheduled([c1, c2], [2, 2]) == diffuse_latent(c1,
    head_steps=2) then diffuse_latent(c2, tail_from=2) on the same
    noise."""
    params, alphas = setup
    c1, c2 = _cond(batch=1), None
    import dataclasses

    c2 = dataclasses.replace(
        c1, context_full=c1.context_full + 0.3,
        context_open_clip=c1.context_open_clip + 0.3)
    key = jax.random.PRNGKey(9)
    got = scheduled_sample_latent(params, TINY_BASE, alphas, [c1, c2],
                                  [2, 2], key, 7.5, 4, jnp.float32,
                                  method="ddim")
    noise_key, _ = jax.random.split(key)
    from sdxl_tpu.pipeline.sampler import gen_noise

    lat0 = gen_noise(noise_key, c1)
    head = diffuse_latent(params, TINY_BASE, alphas,
                          jnp.array(lat0, copy=True), c1, 7.5, 0, 4,
                          jnp.float32, head_steps=2)
    tail = diffuse_latent(params, TINY_BASE, alphas,
                          jnp.array(head, copy=True), c2, 7.5, 0, 4,
                          jnp.float32, tail_from=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(tail),
                               rtol=1e-5, atol=1e-5)


def test_scheduled_stochastic_noise_stream_matches_unscheduled(setup):
    """Splitting at a prompt switch must NOT change the per-step noise
    stream: a two-segment euler_a run with identical conditioning in both
    segments equals the unscheduled run."""
    params, alphas = setup
    cond = _cond(batch=1)
    key = jax.random.PRNGKey(3)
    a = scheduled_sample_latent(params, TINY_BASE, alphas, [cond, cond],
                                [2, 2], key, 7.5, 4, jnp.float32,
                                method="euler_a")
    b = euler_sample_latent(params, TINY_BASE, alphas, cond, key, 7.5, 4,
                            jnp.float32, method="euler_a")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_segment_validation(setup):
    params, alphas = setup
    cond = _cond(batch=1)
    with pytest.raises(ValueError, match="segment lengths"):
        scheduled_sample_latent(params, TINY_BASE, alphas, [cond], [3],
                                jax.random.PRNGKey(0), 7.5, 4, jnp.float32)


# ---------------------------------------------------------------------------
# pipeline level


def test_pipeline_prompt_editing(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import (
        TINY_DIFFUSER,
        TINY_EMBEDDER,
        TINY_VAE,
    )

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    # static prompt through the editing syntax == plain prompt, bitwise
    # (boundary 0 -> "dog" every step -> the ordinary one-scan path)
    a = pipe.txt2img("a [cat:dog:0] pet", resolution=(64, 64), n_steps=2,
                     seed=5)
    b = pipe.txt2img("a dog pet", resolution=(64, 64), n_steps=2, seed=5)
    np.testing.assert_array_equal(a, b)
    # a real switch runs segmented and differs from both endpoints
    c = pipe.txt2img("a [cat:dog:0.5] pet", resolution=(64, 64), n_steps=2,
                     seed=5)
    d = pipe.txt2img("a cat pet", resolution=(64, 64), n_steps=2, seed=5)
    assert c.shape == (1, 64, 64, 3)
    assert not np.array_equal(c, b) and not np.array_equal(c, d)
    # deterministic
    c2 = pipe.txt2img("a [cat:dog:0.5] pet", resolution=(64, 64), n_steps=2,
                      seed=5)
    np.testing.assert_array_equal(c, c2)
    # refused combinations surface clearly
    with pytest.raises(ValueError, match="prompt editing"):
        pipe.txt2img("a [cat:dog:0.5]", resolution=(64, 64), n_steps=2,
                     use_refiner=True)
