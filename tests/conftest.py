"""Test configuration: force JAX onto a virtual 8-device CPU topology.

Multi-chip hardware is not available in CI; sharding tests run on
``--xla_force_host_platform_device_count=8``. This must be set before jax
is imported anywhere in the test process.
"""

import os

# force, don't setdefault: the shell env presets JAX_PLATFORMS=axon (the
# real-TPU tunnel), which would silently run the suite on TPU with bf16
# matmul precision and 20-40s compiles per test
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the axon sitecustomize registers the TPU backend at interpreter start and
# sets jax config programmatically, which beats the env var — override back
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A small synthetic dataset on disk, exercising the full data contract."""
    from murcl_tpu.data.synthetic import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("synthetic")
    return generate_synthetic_dataset(root, num_slides=8, dim=32, num_clusters=5, seed=985)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
