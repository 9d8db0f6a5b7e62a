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
- **Degree-bucketed ELL** (`BucketedEll` + `spmm_bucketed`): sub-ELLs of
  power-of-two width per degree class — the fast path for large power-law
  graphs (no scatter, ~1.3x slot padding; measured 3.2x over COO in bf16
  at ogbl-collab scale, docs/KERNELS.md).

Both compute `out[i] = sum_{j in N(i)} w_ij * x[j]`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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


@dataclasses.dataclass(frozen=True)
class BucketedEll:
    """Degree-bucketed ELL layout — the production large-graph SpMM plan.

    Flat ELL pads every row to the global max degree; on power-law graphs
    that wastes ~max_degree/avg_degree of all gather traffic (8x at
    ogbl-collab scale). Bucketing groups nodes by degree into
    power-of-two-width sub-ELLs so total gathered slots stay within ~1.3x
    of the true edge count, and the aggregation per bucket is a dense
    gather + einsum reduction — no scatter anywhere (each node belongs to
    exactly one bucket, so results merge with disjoint sorted row
    `.set`s). Measured on the chip this beats COO gather+segment_sum 3.2x
    in bf16 and 1.4x in f32 at 235k nodes / 1.9M edges (docs/KERNELS.md).

    Build once on the host from a `Graph`'s ELL view; fields are numpy,
    `operands()` ships them to device as a flat tuple so jitted callers
    can pass them as arguments (closure capture would bake them into the
    compiled program as constants).
    """

    num_nodes: int
    num_edges: int
    # per bucket: (row_ids [n_b], nbr [n_b, w_b], weight [n_b, w_b] f32)
    buckets: tuple[tuple[np.ndarray, np.ndarray, np.ndarray], ...]
    # [num_nodes] node -> position in the concat of per-bucket aggregates
    # (degree-0 nodes -> one zero row past the end): output assembly is a
    # single gather instead of per-bucket `.set`s — each `.set` copies
    # the whole [N, F] accumulator, measured 5.2 ms of the 18.1 ms f32
    # kernel at collab scale (round-5 roofline study, docs/KERNELS.md)
    inv_perm: np.ndarray = None

    @staticmethod
    def build(
        nbr: np.ndarray,
        nbr_mask: np.ndarray,
        nbr_weight: np.ndarray | None = None,
        min_width: int = 2,
    ) -> "BucketedEll":
        nbr = np.asarray(nbr)
        mask = np.asarray(nbr_mask)
        n, d = nbr.shape
        deg = mask.sum(axis=1).astype(np.int64)
        w = mask.astype(np.float32)
        if nbr_weight is not None:
            w = w * np.asarray(nbr_weight, dtype=np.float32)
        # width ladder {2^k, 3·2^(k-1)}: each step grows ≤1.5x, bounding
        # padded slots to ≤1.5x edges worst-case (measured 1.13x on the
        # collab power-law graph vs 1.33x for the old pure-doubling
        # ladder — a direct ~15% cut of gather traffic, the kernel's
        # dominant cost). Bucket count stays ≤ ~2 log2(max_degree).
        widths = []
        width = max(1, min_width)
        while True:
            widths.append(min(width, d))
            if width >= d:
                break
            if width < 4:
                width *= 2  # 1, 2, 4
            elif width & (width - 1) == 0:
                width = width * 3 // 2  # 4 -> 6, 8 -> 12, 16 -> 24, ...
            else:
                width = width * 4 // 3  # 6 -> 8, 12 -> 16, 24 -> 32, ...
        buckets = []
        prev = 0
        inv_perm = np.full(n, -1, dtype=np.int64)
        off = 0
        for wd in widths:
            ids = np.where((deg > prev) & (deg <= wd))[0].astype(np.int32)
            prev = wd
            if len(ids) == 0:
                continue
            buckets.append(
                (ids, nbr[ids, :wd].copy(), w[ids, :wd].copy())
            )
            inv_perm[ids] = off + np.arange(len(ids))
            off += len(ids)
        inv_perm[inv_perm < 0] = off  # degree-0 rows -> the zero row
        return BucketedEll(
            num_nodes=n, num_edges=int(deg.sum()), buckets=tuple(buckets),
            inv_perm=inv_perm.astype(np.int32),
        )

    @staticmethod
    def from_graph(g, transpose: bool = False) -> "BucketedEll":
        """Layout for `out[i] = sum_j w_ij x[nbr_ij]` over a `Graph`'s ELL
        view (rows = src side; for aggregation into dst on an asymmetric
        directed graph, build from the reversed graph instead)."""
        del transpose  # Graph stores one orientation; callers reverse.
        return BucketedEll.build(g.nbr, g.nbr_mask, g.nbr_weight)

    def operands(self):
        """Flat tuple of device-shippable arrays for jitted
        `spmm_bucketed`: (inv_perm, *(ids, nbr, weight) triples)."""
        import jax.numpy as jnp

        out = [jnp.asarray(self.inv_perm)]
        for ids, nb, w in self.buckets:
            out.extend((jnp.asarray(ids), jnp.asarray(nb), jnp.asarray(w)))
        return tuple(out)


def spmm_bucketed(x: jnp.ndarray, num_nodes: int, *operands) -> jnp.ndarray:
    """out[i] = sum_d w[i, d] * x[nbr[i, d]] over a `BucketedEll` layout.

    `operands` is `BucketedEll.operands()` splatted: inv_perm followed by
    (ids, nbr, weight) triples. Weights arrive f32; they are cast to
    `x.dtype` so the whole aggregation runs in the feature dtype (bf16
    halves gather bytes — the measured fast path at scale). Jit-safe:
    bucket count/shapes are static.
    """
    # f32 einsums otherwise lower to bf16 MXU passes (~1e-2 abs error on
    # high-degree rows, observed on v5e); bf16 inputs keep the fast default
    prec = (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    inv_perm, operands = operands[0], operands[1:]
    parts = []
    for i in range(0, len(operands), 3):
        nb, w = operands[i + 1], operands[i + 2]
        # FLAT 1-D index gather then reshape: XLA-on-TPU's fast gather path
        # wants a 2-D operand with 1-D indices; the 2-D-index form `x[nb]`
        # measures 2-5% slower in both dtypes at collab scale
        # (benchmarks/spmm_variants.py, round 3). The reduce engine is
        # irrelevant (einsum vs VPU multiply-reduce measured identical) —
        # the op is bound by slot-row traffic, not FLOPs.
        g = x[nb.reshape(-1)].reshape(*nb.shape, x.shape[1])
        parts.append(jnp.einsum("nd,ndf->nf", w.astype(x.dtype), g,
                                precision=prec))
    # scatter-free assembly: one inverse-permutation gather over the
    # concat of bucket aggregates (bit-identical to per-bucket `.set`s,
    # f32 18.1 -> 14.7 ms at collab scale — each `.set` copies the whole
    # [N, F] accumulator; round-5 roofline study, docs/KERNELS.md)
    parts.append(jnp.zeros((1, x.shape[1]), x.dtype))
    return jnp.concatenate(parts, axis=0)[inv_perm]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def spmm_bucketed_sym(x, num_nodes: int, operands: tuple):
    """`spmm_bucketed` with the symmetric-adjacency custom VJP: for
    w_ij = w_ji, d/dx (A x)^T g = A g, so the backward pass is the SAME
    gather+einsum kernel — no scatter-add over edge slots in either
    direction. Single-chip counterpart of
    `parallel.spmm_shard.spmm_node_sharded_sym` (which pays a shard_map
    wrapper worth ~5% on a 1-device mesh); `operands` is the
    `BucketedEll.operands()` tuple passed as ONE pytree argument."""
    return spmm_bucketed(x, num_nodes, *operands)


def _sym_fwd(x, num_nodes, operands):
    return spmm_bucketed_sym(x, num_nodes, operands), operands


def _sym_bwd(num_nodes, operands, g):
    zeros = tuple(
        np.zeros(a.shape, jax.dtypes.float0)
        if not jnp.issubdtype(a.dtype, jnp.inexact) else jnp.zeros_like(a)
        for a in operands
    )
    return (spmm_bucketed_sym(g, num_nodes, operands), zeros)


spmm_bucketed_sym.defvjp(_sym_fwd, _sym_bwd)


# ---------------------------------------------------------------------------
# regime dispatch — which aggregation kernel for which graph shape
# ---------------------------------------------------------------------------

# one [block_rows=256, num_slots] f32 one-hot tile must fit VMEM alongside
# the feature stripe: 256 x 16384 x 4B = 16 MiB, the practical ceiling
ONEHOT_MAX_SLOTS = 16384
# whole-graph one-hot: the [256, N] tile bound, same budget over node count
ONEHOT_MAX_NODES = 16384


def choose_backend_1wl(
    num_rows: int, num_slots: int, platform: str | None = None
) -> str:
    """Regime rule for message-aggregation inside GCN layers (the TwoWL
    1-WL stack). RESOLVED 'plan' everywhere as of round 5: the one-hot
    MXU kernel (`segment_sum_onehot` / `spmm_ell_pallas`) was re-A/B'd
    on the current jax 0.9 TPU runtime IN its own claimed regime
    (fb-pages-food, 3.5k slots) and LOSES — raw aggregation 0.75 ms vs
    sub-dispatch-floor for the planned path, end-to-end forward 25.4 vs
    24.0 ms. XLA's plain-gather lowering improved past every manual
    Pallas formulation this framework tried (docs/KERNELS.md, "Pallas
    verdict"); the kernels remain available via
    `TwoWLConfig(agg_1wl='pallas')` / `spmm_auto(force=...)` for
    regression measurement."""
    del num_rows, num_slots, platform
    return "plan"


def spmm_auto(
    nbr,
    nbr_mask,
    x: jnp.ndarray,
    nbr_weight=None,
    platform: str | None = None,
    force: str | None = None,
) -> jnp.ndarray:
    """Whole-graph SpMM with host-side regime dispatch (the role
    torch-scatter/torch-sparse play for the reference's PyG layers,
    `TwoWL/model/model.py:36-41`):

    - 'bucketed' — degree-bucketed ELL (builds the layout on the host;
                   amortize by building `BucketedEll` once and calling
                   `spmm_bucketed` directly in loops) — the default for
                   large graphs,
    - 'ell'      — flat gather+einsum (small graphs / CPU / tests),
    - 'pallas'   — one-hot MXU kernel, `force` only: RETIRED from auto
                   dispatch in round 5 (loses its own regime on the
                   current runtime — docs/KERNELS.md "Pallas verdict").

    `nbr`/`nbr_mask` must be host (numpy) arrays when the bucketed regime
    can be chosen (layout build reads them); jit callers inside a fixed
    regime should call the regime's kernel directly.
    """
    import numpy as np

    platform = platform or jax.devices()[0].platform
    n = nbr.shape[0]
    regime = force
    if regime is None:
        regime = "bucketed" if n > ONEHOT_MAX_NODES else "ell"
    if regime == "pallas":
        from linkpred_tpu.ops.pallas_kernels import spmm_ell_auto

        return spmm_ell_auto(jnp.asarray(nbr), jnp.asarray(nbr_mask), x,
                             None if nbr_weight is None
                             else jnp.asarray(nbr_weight))
    if regime == "bucketed":
        lay = BucketedEll.build(
            np.asarray(nbr), np.asarray(nbr_mask),
            None if nbr_weight is None else np.asarray(nbr_weight),
        )
        return spmm_bucketed(x, lay.num_nodes, *lay.operands())
    return spmm_ell(jnp.asarray(nbr), jnp.asarray(nbr_mask), x,
                    None if nbr_weight is None else jnp.asarray(nbr_weight))


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
