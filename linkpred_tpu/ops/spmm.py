"""Sparse matrix × dense matrix aggregation (SpMM).

The reference's message passing runs inside torch-sparse/torch-scatter C++
kernels (PyG `GCNConv` spmm; `TwoWL/utils.py:60-68` sparse row sums). Here we
provide two TPU-native layouts:

- **COO + segment_sum** (`spmm_coo`): general, supports per-edge weights and
  dynamic validity masks with static shapes. XLA lowers the gather +
  sorted-segment-sum well; this is the default for edge-index graphs whose
  edge set changes under masking (TwoWL).
- **ELL gather-sum** (`spmm_ell`): `[N, max_deg]` padded neighbor matrix.
  One static gather of shape `[N, max_deg, F]` and a reduction over the
  degree axis — fully dense-shaped, the layout of choice for whole-graph
  propagation and the Pallas kernel
  (`linkpred_tpu.ops.pallas_kernels.spmm_ell_pallas`).

Both compute `out[i] = sum_{j in N(i)} w_ij * x[j]`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from linkpred_tpu.ops.segment import segment_sum


def spmm_coo(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    x: jnp.ndarray,
    num_nodes: int,
    edge_weight: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """out[dst] += w * x[src]; x: [N, F] -> [num_nodes, F]."""
    msgs = x[src]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return segment_sum(msgs, dst, num_nodes, mask)


@partial(jax.jit, static_argnames=())
def spmm_ell(
    nbr: jnp.ndarray,
    nbr_mask: jnp.ndarray,
    x: jnp.ndarray,
    nbr_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ELL aggregation: nbr [N, D] int32, nbr_mask [N, D] bool, x [N, F].

    out[i] = sum_d mask[i,d] * w[i,d] * x[nbr[i,d]].
    """
    gathered = x[nbr]  # [N, D, F]
    w = nbr_mask.astype(x.dtype)
    if nbr_weight is not None:
        w = w * nbr_weight
    return jnp.einsum("nd,ndf->nf", w, gathered)


def spmm_ell_blocked(
    nbr: jnp.ndarray,
    nbr_mask: jnp.ndarray,
    x: jnp.ndarray,
    nbr_weight: jnp.ndarray | None = None,
    block_rows: int = 4096,
) -> jnp.ndarray:
    """ELL aggregation computed in row blocks via `lax.map` to bound the
    [block, D, F] gather working set for large graphs (HBM-friendly)."""
    n, d = nbr.shape
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    nbr_p = jnp.pad(nbr, ((0, pad), (0, 0)))
    mask_p = jnp.pad(nbr_mask, ((0, pad), (0, 0)))
    w_p = None
    if nbr_weight is not None:
        w_p = jnp.pad(nbr_weight, ((0, pad), (0, 0))).reshape(
            nblocks, block_rows, d
        )

    nbr_b = nbr_p.reshape(nblocks, block_rows, d)
    mask_b = mask_p.reshape(nblocks, block_rows, d)

    def one_block(args):
        if w_p is not None:
            nb, mb, wb = args
            w = mb.astype(x.dtype) * wb
        else:
            nb, mb = args
            w = mb.astype(x.dtype)
        return jnp.einsum("nd,ndf->nf", w, x[nb])

    args = (nbr_b, mask_b, w_p) if w_p is not None else (nbr_b, mask_b)
    out = jax.lax.map(one_block, args)
    return out.reshape(nblocks * block_rows, -1)[:n]


def gcn_aggregate(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    x: jnp.ndarray,
    num_nodes: int,
    mask: jnp.ndarray | None = None,
    add_self_loops: bool = True,
) -> jnp.ndarray:
    """Symmetric-normalized GCN propagation over an edge index:
    `out = D^-1/2 (A + I) D^-1/2 x` with degrees from the (masked) edges.
    This is the aggregation inside the reference's PyG `GCNConv`."""
    from linkpred_tpu.ops.segment import gcn_norm_coefficients

    coeff, self_coeff = gcn_norm_coefficients(
        src, dst, num_nodes, mask=mask, add_self_loops=add_self_loops
    )
    out = spmm_coo(src, dst, x, num_nodes, edge_weight=coeff, mask=mask)
    if add_self_loops:
        out = out + self_coeff[:, None] * x
    return out
