"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This must set env vars before the first `import jax` anywhere in the test
process (pytest imports conftest first). Multi-chip sharding tests then see
8 XLA host devices — the TPU-world analog of a fake backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin at interpreter start and
# force-sets the `jax_platforms` config (which outranks the env var), so we
# must override the config itself to keep tests on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def fb_graph():
    from linkpred_tpu.data.io import load_fb_pages_food

    g, edges = load_fb_pages_food()
    return g, edges
