"""Device/platform selection helpers.

The axon TPU plugin's sitecustomize force-sets the `jax_platforms` config
to "axon,cpu" at interpreter start, which outranks the JAX_PLATFORMS env
var. Anything that should honor an explicit CPU request (the driver's
virtual-mesh dry run, `benchmarks/scaling.py` on the 8-device CPU mesh,
tests) must re-apply the env var at config level before devices are
touched.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Re-apply JAX_PLATFORMS over the sitecustomize config override.

    No-op when the env var is unset or already includes the axon TPU.
    Safe to call after jax import; best-effort once devices exist.
    """
    req = os.environ.get("JAX_PLATFORMS", "")
    if req and "axon" not in req:
        import jax

        try:
            jax.config.update("jax_platforms", req)
        except Exception:
            pass  # devices already initialized; keep whatever we have
