"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding is validated on
virtual CPU devices (xla_force_host_platform_device_count=8). This must be
set before jax is imported anywhere.
"""

import os

# Force-override: the driver environment presets JAX_PLATFORMS=axon (TPU),
# and the axon plugin ignores the env var — jax.config.update is required.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402


REFERENCE_TOKENIZER_DIR = "/root/reference/tokenizer"


@pytest.fixture(scope="session")
def tokenizer_dir():
    """None = the vendored in-package BPE table (self-contained path).

    The whole suite must pass with /root/reference unmounted; tests that
    specifically exercise external-dir loading use reference_tokenizer_dir.
    """
    return None


@pytest.fixture(scope="session")
def reference_tokenizer_dir():
    if not os.path.isdir(REFERENCE_TOKENIZER_DIR):
        pytest.skip("reference tokenizer data not available")
    return REFERENCE_TOKENIZER_DIR
