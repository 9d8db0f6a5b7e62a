"""Pallas TPU kernels for the hot aggregation ops.

Strategy: on TPU, scatter/gather is the enemy and the MXU is near-free, so
the ELL-layout SpMM is reformulated as **block-dense one-hot matmul**: for a
block of rows, the padded neighbor lists `nbr[i, d]` are expanded in-VMEM to
a dense {0,1} block-adjacency via an iota-compare (no host densification,
no HBM traffic beyond the int32 neighbor lists), then multiplied against
the feature matrix on the MXU. For graphs up to a few tens of thousands of
nodes — the regime of every reference workload — this turns the reference's
torch-scatter/torch-sparse aggregation (`requirements.txt:18-19`) into pure
systolic-array work.

The kernel tiles rows (grid dim 0) and feature columns (grid dim 1); the
feature operand streams through VMEM one [N, TF] stripe at a time. Falls
back to interpret mode off-TPU so tests exercise the same kernel on the
CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmm_kernel(nbr_ref, mask_ref, x_ref, out_ref, *, block_rows, num_nodes):
    """One (row-block, feature-stripe) tile:
    out[r, :] = sum_d mask[r, d] * x[nbr[r, d], :], computed as
    A_block @ x with A_block[r, n] = #{d : nbr[r, d] == n, mask}.

    The neighbor operands arrive transposed ([D, BR]) so the degree loop
    reads one slot-row per iteration straight from the Ref — a dynamic ref
    read `fori_loop` (Mosaic has no dynamic_slice on values, and a static
    unroll would stack-allocate every [BR, N] compare temporary at once).
    """
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, num_nodes), 1)
    D = nbr_ref.shape[0]

    def body(d, acc):
        col = nbr_ref[d, :]  # [BR]
        w = mask_ref[d, :]  # [BR]
        hit = (col_ids == col[:, None]).astype(jnp.float32)
        return acc + hit * w[:, None]

    acc = jax.lax.fori_loop(
        0, D, body, jnp.zeros((block_rows, num_nodes), dtype=jnp.float32)
    )
    # HIGHEST: full-f32 MXU passes — the default lowers f32 matmuls to bf16
    # passes (~1e-3 relative error, observed 5e-2 abs on v5e)
    out_ref[:] = jax.lax.dot_general(
        acc, x_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_feats", "interpret")
)
def spmm_ell_pallas(
    nbr: jnp.ndarray,  # [N, D] int32
    nbr_weight: jnp.ndarray,  # [N, D] float32 (0 where invalid)
    x: jnp.ndarray,  # [N, F] float32
    block_rows: int = 256,
    block_feats: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = sum_d w[i, d] * x[nbr[i, d]] as a Pallas one-hot-MXU kernel.

    `x` may have any row count (`nbr` values index x rows) — whole-graph
    SpMM passes node features (rows = N), the segment-sum regime
    (`ops.segment.segment_sum_onehot`) passes per-slot messages
    (rows = num_slots + 1 zero row).
    """
    n, d = nbr.shape
    nx, f = x.shape
    n_pad = _round_up(n, block_rows)
    f_pad = _round_up(f, block_feats)
    # transpose the neighbor operands to [D, N] so the kernel's degree loop
    # reads a [BR] slot-row per iteration
    nbr_t = jnp.pad(nbr, ((0, n_pad - n), (0, 0))).T
    w_t = jnp.pad(
        nbr_weight.astype(jnp.float32), ((0, n_pad - n), (0, 0))
    ).T
    x_p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, f_pad - f)))

    grid = (n_pad // block_rows, f_pad // block_feats)
    out = pl.pallas_call(
        functools.partial(
            _spmm_kernel, block_rows=block_rows, num_nodes=nx
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block_rows), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_rows), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, block_feats), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, block_feats), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(nbr_t, w_t, x_p)
    return out[:n, :f]


def _sddmm_kernel(src_ref, dst_ref, x_ref, y_ref, out_ref, *, block_edges, num_nodes):
    """One edge-block tile: out[e] = <x[src[e]], y[dst[e]]>.

    Gathers become one-hot MXU matmuls: S = onehot(src) @ x and
    T = onehot(dst) @ y ([BE, N] x [N, F]), then a row-wise dot. Same
    Mosaic-friendly structure as the SpMM kernel (no value-gathers).
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_edges, num_nodes), 1)
    s_hot = (row_ids == src_ref[:, 0][:, None]).astype(jnp.float32)
    t_hot = (row_ids == dst_ref[:, 0][:, None]).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    xs = jax.lax.dot_general(
        s_hot, x_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    yt = jax.lax.dot_general(
        t_hot, y_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.sum(xs * yt, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_edges", "interpret"))
def sddmm_pallas(
    src: jnp.ndarray,  # [E] int32
    dst: jnp.ndarray,  # [E] int32
    x: jnp.ndarray,  # [N, F] float32
    y: jnp.ndarray,  # [N, F] float32
    block_edges: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-edge dot products as a Pallas one-hot-MXU kernel: [E] float32."""
    e = src.shape[0]
    n = x.shape[0]
    e_pad = _round_up(e, block_edges)
    src_p = jnp.pad(src, (0, e_pad - e)).reshape(-1, 1)
    dst_p = jnp.pad(dst, (0, e_pad - e)).reshape(-1, 1)

    grid = (e_pad // block_edges,)
    out = pl.pallas_call(
        functools.partial(
            _sddmm_kernel, block_edges=block_edges, num_nodes=n
        ),
        out_shape=jax.ShapeDtypeStruct((e_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_edges, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_edges, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_edges, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(src_p, dst_p, x.astype(jnp.float32), y.astype(jnp.float32))
    return out[:e, 0]


def sddmm_auto(src, dst, x, y=None, block_edges: int = 256):
    """Dispatch to the Pallas SDDMM on TPU, interpret mode elsewhere."""
    if y is None:
        y = x
    on_tpu = jax.devices()[0].platform == "tpu"
    return sddmm_pallas(
        src, dst, x, y, block_edges=block_edges, interpret=not on_tpu
    )


def _rowdma_kernel(nbr_ref, w_ref, x_hbm, out_ref, *, rows, width, feats):
    """One row-tile of the explicit-DMA bucketed SpMM: for each (row, slot)
    issue a single-row HBM->VMEM copy of x[nbr[row, slot]], double-buffered
    two deep, and accumulate w * row into the output row.

    This is the "double-buffered DMA of neighbor-row tiles" design from the
    round-2 review. Its structural cost: one DMA descriptor per 256-512 B
    neighbor row — the same traffic XLA's native gather instruction issues
    from purpose-built hardware without per-descriptor overhead. Measured
    (benchmarks/spmm_variants.py --pallas) it loses to the XLA gather
    variants by a wide margin; kept as the recorded negative result.
    """
    def body(scratch, sems):
        total = rows * width

        def get_dma(slot, t):
            r = t // width
            d = t - r * width
            return pltpu.make_async_copy(
                x_hbm.at[nbr_ref[r, d]],
                scratch.at[slot],
                sems.at[slot],
            )

        get_dma(0, 0).start()

        def loop(t, acc):
            slot = t % 2

            @pl.when(t + 1 < total)
            def _():
                get_dma((t + 1) % 2, t + 1).start()

            get_dma(slot, t).wait()
            r = t // width
            d = t - r * width
            acc = acc + w_ref[r, d] * scratch[pl.ds(slot, 1), :]
            row_end = d == width - 1

            @pl.when(row_end)
            def _():
                out_ref[pl.ds(r, 1), :] = acc

            return jnp.where(row_end, jnp.zeros_like(acc), acc)

        jax.lax.fori_loop(
            0, total, loop, jnp.zeros((1, feats), jnp.float32)
        )

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, feats), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "interpret"))
def spmm_rowdma_pallas(
    nbr: jnp.ndarray,  # [n_b, w] int32
    weight: jnp.ndarray,  # [n_b, w] float32 (0 where invalid)
    x: jnp.ndarray,  # [N, F] float32
    rows_per_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Explicit per-row-DMA gather+reduce for one ELL bucket: [n_b, F]."""
    n_b, w = nbr.shape
    f = x.shape[1]
    n_pad = _round_up(max(n_b, 1), rows_per_tile)
    nbr_p = jnp.pad(nbr, ((0, n_pad - n_b), (0, 0)))
    w_p = jnp.pad(weight.astype(jnp.float32), ((0, n_pad - n_b), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _rowdma_kernel, rows=rows_per_tile, width=w, feats=f
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        grid=(n_pad // rows_per_tile,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, w), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_per_tile, w), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rows_per_tile, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(nbr_p, w_p, x.astype(jnp.float32))
    return out[:n_b]


def spmm_rowdma_bucketed(x, num_nodes: int, *operands) -> jnp.ndarray:
    """`spmm_bucketed`-compatible wrapper over the per-row-DMA kernel."""
    on_tpu = jax.devices()[0].platform == "tpu"
    out = jnp.zeros((num_nodes, x.shape[1]), jnp.float32)
    for i in range(0, len(operands), 3):
        ids, nb, w = operands[i], operands[i + 1], operands[i + 2]
        agg = spmm_rowdma_pallas(nb, w, x, interpret=not on_tpu)
        out = out.at[ids].set(agg, unique_indices=True,
                              indices_are_sorted=True)
    return out.astype(x.dtype)


def spmm_ell_auto(nbr, nbr_mask, x, nbr_weight=None, block_rows: int = 256):
    """Dispatch to the Pallas kernel on TPU, interpret mode elsewhere."""
    w = nbr_mask.astype(jnp.float32)
    if nbr_weight is not None:
        w = w * nbr_weight
    on_tpu = jax.devices()[0].platform == "tpu"
    return spmm_ell_pallas(
        nbr, w, x, block_rows=block_rows, interpret=not on_tpu
    )
