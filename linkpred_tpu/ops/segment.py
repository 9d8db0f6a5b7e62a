"""Segment/scatter aggregation primitives.

These replace the reference's torch-scatter C++/CUDA kernels
(`TwoWL/utils.py:8-10` computes degrees with `scatter_add`; every PyG
`GCNConv` in `TwoWL/model/model.py` scatters messages by destination).
On TPU the idiomatic form is `jax.ops.segment_sum` (lowered by XLA to an
efficient sorted-segment reduction) over *static-capacity* edge arrays with
validity masks, so everything stays jit-compatible when edges are
masked/dropped dynamically (e.g. TwoWL's `sample_block` leakage masking).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked segment sum. `data` [E, ...], `segment_ids` [E] -> [S, ...].

    Pass `indices_are_sorted=True` when the ids are presorted (static edge
    structures sorted once on the host) — XLA then skips the per-call sort,
    the dominant cost of an unsorted scatter on TPU. Ids >= num_segments
    (capacity padding) are dropped.
    """
    if mask is not None:
        data = data * mask.reshape((-1,) + (1,) * (data.ndim - 1)).astype(data.dtype)
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    ones = jnp.ones((data.shape[0],), dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask)
    tot = segment_sum(data, segment_ids, num_segments, mask)
    return tot / jnp.maximum(cnt, eps).reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_nodes",))
def degree_from_edges(
    dst: jnp.ndarray, num_nodes: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """In-degree by destination — the TPU equivalent of reference
    `TwoWL/utils.py:8-10` (`scatter_add(ones, ei[1])`). With `mask`, masked
    edges do not count (used by `sample_block`-style leakage removal)."""
    ones = jnp.ones_like(dst, dtype=jnp.float32)
    return segment_sum(ones, dst, num_nodes, mask)


def gcn_norm_coefficients(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    mask: jnp.ndarray | None = None,
    add_self_loops: bool = True,
    indices_are_sorted: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric GCN normalization `1/sqrt(d_u d_v)` per edge.

    Matches PyG's `gcn_norm` semantics used inside the reference's `GCNConv`
    layers: degrees count incoming edge weight by `dst` (+1 when self-loops
    are added), and each edge weight becomes
    `deg_inv_sqrt[src] * deg_inv_sqrt[dst]`.

    Returns (edge_coeff [E], self_loop_coeff [N]); the self-loop contribution
    is applied densely by the caller (keeps the edge arrays static).
    """
    deg = segment_sum(
        jnp.ones_like(dst, dtype=jnp.float32), dst, num_nodes, mask,
        indices_are_sorted=indices_are_sorted,
    )
    if add_self_loops:
        deg = deg + 1.0
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    coeff = dinv[src] * dinv[dst]
    if mask is not None:
        coeff = coeff * mask.astype(coeff.dtype)
    self_coeff = dinv * dinv if add_self_loops else jnp.zeros_like(dinv)
    return coeff, self_coeff
