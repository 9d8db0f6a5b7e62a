"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This must set env vars before the first `import jax` anywhere in the test
process (pytest imports conftest first). Multi-chip sharding tests then see
8 XLA host devices — the TPU-world analog of a fake backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
