"""SDDMM — sampled dense-dense matmul: per-edge scores from node features.

`out[e] = <x[src[e]], y[dst[e]]>` for each edge. The reference computes edge
representations as elementwise products of endpoint embeddings
(`TwoWL/model/model.py:75` `x[pos[:,0]] * x[pos[:,1]]`) and pair features as
sums (`LogisticRegression_Linkprediction/utils/feature_extraction.py:19-23`);
SDDMM is the shared primitive underneath (gather + fused reduction).
"""

from __future__ import annotations

import jax.numpy as jnp


def sddmm_coo(
    src: jnp.ndarray, dst: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-edge dot products: [E] from x [N, F] (and optionally y [N, F])."""
    if y is None:
        y = x
    return jnp.einsum("ef,ef->e", x[src], y[dst])


def edge_hadamard(src: jnp.ndarray, dst: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-edge elementwise product of endpoint features: [E, F]."""
    return x[src] * x[dst]


def edge_sum(src: jnp.ndarray, dst: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-edge sum of endpoint features: [E, F] (node2vec pair features)."""
    return x[src] + x[dst]
