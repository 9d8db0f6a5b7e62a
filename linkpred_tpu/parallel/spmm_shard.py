"""Edge-partitioned sparse aggregation over a device mesh.

The multi-chip SpMM design (SURVEY.md §7 step 8): the edge set is sharded
over the ``edge`` mesh axis; every device computes a *partial* segment-sum
of its edge shard into a full-height [N, F] accumulator, and partials are
combined with one `psum` over the ``edge`` axis — XLA rides this collective
over ICI. This carries the behavioral contract of the Spark walk/aggregate
partitioning (`Node2vec.scala:52-61, 103-124`: partition edges, aggregate
locally, exchange) without any RDD shuffle.

For feature dims that don't fit replicated, the same kernel composes with a
sharded feature axis (`P(None, "data")`) — GSPMD then splits the psum into
reduce-scatters automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from linkpred_tpu.ops.segment import segment_sum


def spmm_edge_partitioned(
    mesh: Mesh,
    src: jnp.ndarray,  # [E] int32 (E divisible by mesh axis size, pad+mask)
    dst: jnp.ndarray,  # [E]
    x: jnp.ndarray,  # [N, F] node features (replicated)
    num_nodes: int,
    edge_weight: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """out[i] = sum_{e: dst_e = i} w_e x[src_e], edges sharded over ``edge``."""

    def local(src_l, dst_l, x_l, w_l, m_l):
        msgs = x_l[src_l]
        if w_l is not None:
            msgs = msgs * w_l[:, None]
        part = segment_sum(msgs, dst_l, num_nodes, m_l)
        return jax.lax.psum(part, "edge")

    espec = P("edge")
    has_w = edge_weight is not None
    has_m = mask is not None

    fn = shard_map(
        lambda s, d, xx, w, mm: local(s, d, xx, w if has_w else None, mm if has_m else None),
        mesh=mesh,
        in_specs=(espec, espec, P(), espec if has_w else P(), espec if has_m else P()),
        out_specs=P(),
    )
    w = edge_weight if has_w else jnp.zeros((src.shape[0],), x.dtype)
    mm = mask if has_m else jnp.ones((src.shape[0],), bool)
    return fn(src, dst, x, w, mm)


def pad_edges_for_mesh(arrs, axis_size: int, pad_value=0):
    """Pad 1-D edge arrays to a multiple of the mesh axis size; returns
    (padded_arrays, valid_mask)."""
    e = arrs[0].shape[0]
    target = -(-e // axis_size) * axis_size
    pad = target - e
    out = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), constant_values=pad_value) for a in arrs]
    mask = jnp.arange(target) < e
    return out, mask
