"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (the TPU-world analogue of a fake distributed
backend — SURVEY.md §4)."""

import os

# The session env pins JAX_PLATFORMS=axon (the tunneled TPU); tests must
# override it — force CPU before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# zero-egress container: skip huggingface_hub's 5x8s DNS-retry stall when a
# test path calls from_pretrained (it falls back to config defaults anyway)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize may have imported jax already (axon backend registration), so
# the env var alone can be too late — force the platform through the config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
