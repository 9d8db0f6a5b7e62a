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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather that is ALWAYS fast on TPU: measured, XLA serializes any
    gather whose operand has more than one trailing dim (3-D gathers and
    vmap-batched gathers run ~30x slower than the same bytes as a 2-D
    [rows, cols] gather — docs/KERNELS.md). Flattens trailing dims, does a
    2-D take, reshapes back. `idx` may be any integer shape."""
    tail = x.shape[1:]
    flat = x.reshape(x.shape[0], -1) if len(tail) != 1 else x
    out = flat[idx]
    return out.reshape(idx.shape + tail)


def take_rows_fat(x: jnp.ndarray, idx: jnp.ndarray,
                  pack: int | None = None) -> jnp.ndarray:
    """Row gather for NARROW rows: fetch `pack` consecutive rows as one
    fat (>=512-byte) row and select the target in-register.

    HISTORY NOTE — measured both ways, currently NOT the fast path: on
    the round-4 stack this beat the plain gather 3.7x at the 2-WL shape
    (2.2M x 64 B rows). Re-measured on the current jax 0.9 TPU runtime
    at the 50k-node 2-WL shape (4.77M x 64 B rows from a 704k-row
    table), the PLAIN 2-D gather wins 2.8x (55.6 ms vs 157 ms f32;
    bf16 97.5-178 ms) — XLA's gather lowering improved past the manual
    pack-and-select, whose `pack` masked accumulation passes are now
    pure VPU overhead. The planned segment-sum paths therefore use the
    plain gather again (`_planned_fwd_impl`); this kernel is kept for
    regression measurement (benchmarks/twowl_profile.py) and for
    runtimes where the old behavior returns.

    `[R, F]` reshaped to `[R/pack, pack*F]` is layout-free (row-major
    contiguity), the fat gather fetches `idx // pack`, and the target
    sub-row is selected by `pack` masked 2-D accumulations. STRICTLY
    2-D intermediates throughout: a one-hot einsum over a [s, pack, F]
    (or 4-D) tensor tile-pads the small trailing dims 8-16x and OOM'd
    the 50k-node 2-WL compile (21 GB HBM for a 1.7 GB tensor). Exactly
    equal to `x[idx]`.
    """
    n, f = x.shape
    if pack is None:
        # cap the unrolled select at 16 slices; target a >=512-BYTE fat
        # row (128 f32 lanes / 256 bf16 lanes) — the TPU's useful
        # transaction size — so halving the element size doubles the
        # candidate rows per fetch instead of wasting half of each one
        target = 512 // max(np.dtype(x.dtype).itemsize, 1)
        pack = max(1, min(target // max(f, 1), 16))
    if pack <= 1 or n < pack:
        return x[idx]
    npad = -(-n // pack) * pack
    xp = x if npad == n else jnp.pad(x, ((0, npad - n), (0, 0)))
    fat = xp.reshape(npad // pack, pack * f)[idx // pack]  # [s, pack*f]
    sel = idx % pack
    out = jnp.zeros((idx.shape[0], f), x.dtype)
    for p in range(pack):
        m = (sel == p).astype(x.dtype)[:, None]
        out = out + fat[:, p * f:(p + 1) * f] * m
    return out


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
    plan: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric GCN normalization `1/sqrt(d_u d_v)` per edge.

    Matches PyG's `gcn_norm` semantics used inside the reference's `GCNConv`
    layers: degrees count incoming edge weight by `dst` (+1 when self-loops
    are added), and each edge weight becomes
    `deg_inv_sqrt[src] * deg_inv_sqrt[dst]`.

    Returns (edge_coeff [E], self_loop_coeff [N]); the self-loop contribution
    is applied densely by the caller (keeps the edge arrays static).
    """
    ones = jnp.ones_like(dst, dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask.astype(jnp.float32)
    if plan is not None:
        deg = segment_sum_planned(num_nodes, ones, *plan)
    else:
        deg = segment_sum(
            ones, dst, num_nodes, indices_are_sorted=indices_are_sorted
        )
    if add_self_loops:
        deg = deg + 1.0
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    coeff = dinv[src] * dinv[dst]
    if mask is not None:
        coeff = coeff * mask.astype(coeff.dtype)
    self_coeff = dinv * dinv if add_self_loops else jnp.zeros_like(dinv)
    return coeff, self_coeff


# ---------------------------------------------------------------------------
# planned (scatter-free) segment sum for static segment structures
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SegmentPlan:
    """Host-built, scatter-free plan for a *static* segment structure.

    Two measured XLA-on-TPU facts motivate this (docs/KERNELS.md): the
    scatter-add inside `segment_sum` runs at ~5% of HBM peak, and a
    *vmapped* scatter serializes (14x slower than the same work batched
    into columns) — which cripples vmapped-trials training. When segment
    ids are known on the host (TwoWL's message/ei2 structures; any static
    graph), the sum can instead be planned as pure gathers:

    - slots grouped per segment into degree-bucketed `[m_b, w_b]` position
      matrices (power-of-two widths, sentinel `num_slots` pads),
    - forward: gather + width-axis reduce per bucket, concatenate, then
      one gather by a precomputed inverse permutation reorders segment
      rows (count-0 segments point at a zero row) — no scatter anywhere,
    - backward (custom VJP): the slots partition the segment rows, so the
      cotangent is exactly `g[segment_id]` per slot — one gather; JAX's
      default would emit a scatter here too.

    Both directions are gathers, so `jax.vmap` batches them natively.
    Masking composes by zeroing message rows (weights) before the sum.
    """

    num_segments: int
    num_slots: int
    dst_clipped: np.ndarray  # [S] int32 ids, >= num_segments -> sentinel
    inv_perm: np.ndarray  # [num_segments] int32 into concat-of-buckets
    slot_buckets: tuple  # of int32 [m_b, w_b] slot-position matrices

    @staticmethod
    def build(segment_ids: np.ndarray, num_segments: int,
              min_width: int = 4) -> "SegmentPlan":
        ids = np.asarray(segment_ids, dtype=np.int64).reshape(-1)
        s = ids.shape[0]
        valid = (ids >= 0) & (ids < num_segments)
        counts = np.bincount(ids[valid], minlength=num_segments)
        order = np.argsort(ids[valid], kind="stable")
        slot_pos = np.nonzero(valid)[0][order].astype(np.int32)
        starts = np.concatenate([[0], np.cumsum(counts)])

        max_c = int(counts.max()) if num_segments else 0
        widths = []
        w = max(1, min_width)
        while True:
            widths.append(min(w, max(max_c, 1)))
            if w >= max_c:
                break
            w *= 2
        inv_perm = np.full(num_segments, -1, dtype=np.int64)
        slot_buckets = []
        offset = 0
        prev = 0
        for wd in widths:
            segs = np.nonzero((counts > prev) & (counts <= wd))[0]
            prev = wd
            if len(segs) == 0:
                continue
            m = len(segs)
            # vectorized ragged-to-padded fill (no per-segment Python loop)
            pos = starts[segs][:, None] + np.arange(wd)[None, :]
            ok = np.arange(wd)[None, :] < counts[segs][:, None]
            mat = np.where(
                ok,
                slot_pos[np.minimum(pos, len(slot_pos) - 1)],
                np.int32(s),
            ).astype(np.int32)
            inv_perm[segs] = offset + np.arange(m)
            offset += m
            slot_buckets.append(mat)
        inv_perm[inv_perm < 0] = offset  # count-0 segments -> zero row
        return SegmentPlan(
            num_segments=num_segments,
            num_slots=s,
            dst_clipped=np.minimum(ids, num_segments).astype(np.int32),
            inv_perm=inv_perm.astype(np.int32),
            slot_buckets=tuple(slot_buckets),
        )

    def operands(self):
        """Flat tuple of device arrays for `segment_sum_planned` — valid
        pytree leaves, so plans ride inside jitted containers."""
        return (
            jnp.asarray(self.dst_clipped),
            jnp.asarray(self.inv_perm),
            tuple(jnp.asarray(b) for b in self.slot_buckets),
        )

    def ell_operands(self):
        """Single padded `[num_segments, W]` slot matrix + validity mask
        for the one-hot-MXU regime (`segment_sum_onehot`): row r lists the
        slot positions of segment r, sentinel `num_slots` pads. W is the
        max segment count. Only viable when `num_slots` is small enough
        for a `[block_rows, num_slots]` one-hot tile to fit VMEM (the
        `choose_backend_1wl` dispatch rule in ops.spmm)."""
        W = max((b.shape[1] for b in self.slot_buckets), default=1)
        rows = [
            np.pad(b, ((0, 0), (0, W - b.shape[1])),
                   constant_values=self.num_slots)
            for b in self.slot_buckets
        ]
        # count-0 segments' inv_perm points one past the last bucket row
        rows.append(np.full((1, W), self.num_slots, dtype=np.int32))
        mat = np.concatenate(rows, axis=0)[self.inv_perm]
        return jnp.asarray(mat), jnp.asarray(mat < self.num_slots)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def segment_sum_planned(num_segments: int, msgs, dst, inv_perm, slot_buckets):
    """Scatter-free segment sum over a `SegmentPlan`.

    `msgs` [S, ...] -> [num_segments, ...]; `(dst, inv_perm, slot_buckets)`
    come from `SegmentPlan.operands()` (slot_buckets is a tuple).
    Equivalent to `segment_sum(msgs, ids, num_segments)` for the plan's
    static ids, but both forward and backward are pure gathers
    (vmap-friendly, fast on TPU — see class docstring).
    """
    return _planned_fwd_impl(msgs, inv_perm, slot_buckets)


def _planned_fwd_impl(msgs, inv_perm, slot_buckets):
    # all gathers in flattened-2-D form (see take_rows): TPU serializes
    # gathers with >1 trailing dim. Indices are flattened too — the
    # 1-D-index gather is XLA-on-TPU's fastest path (2-D index arrays
    # measured 2-5% slower at collab scale, benchmarks/spmm_variants.py).
    # Plain gather, NOT take_rows_fat: re-measured on jax 0.9 the plain
    # lowering wins 2.8x at the 2-WL shape (see take_rows_fat docstring).
    tail = msgs.shape[1:]
    flat = msgs.reshape(msgs.shape[0], -1)
    f = flat.shape[1]
    ext = jnp.concatenate(
        [flat, jnp.zeros((1, f), flat.dtype)], axis=0
    )
    parts = [
        ext[b.reshape(-1)].reshape(*b.shape, -1).sum(axis=1)
        for b in slot_buckets
    ]
    parts.append(jnp.zeros((1, f), flat.dtype))
    out = jnp.concatenate(parts, axis=0)[inv_perm]
    return out.reshape((out.shape[0],) + tail)


def _planned_fwd(num_segments, msgs, dst, inv_perm, slot_buckets):
    return _planned_fwd_impl(msgs, inv_perm, slot_buckets), (dst,)


def _planned_bwd(num_segments, res, g):
    (dst,) = res
    tail = g.shape[1:]
    flat = g.reshape(g.shape[0], -1)
    g_ext = jnp.concatenate(
        [flat, jnp.zeros((1, flat.shape[1]), flat.dtype)], axis=0
    )
    out = g_ext[dst]  # plain gather (see take_rows_fat history note)
    return (out.reshape((dst.shape[0],) + tail), None, None, None)


segment_sum_planned.defvjp(_planned_fwd, _planned_bwd)


@jax.custom_vjp
def gather_rows_planned(x, idx, plan):
    """Row gather `x[idx]` whose BACKWARD is the scatter-free planned
    segment-sum instead of XLA's default scatter-add.

    The default VJP of a gather is `zeros.at[idx].add(g)` — an unsorted
    scatter over every slot, which on TPU serializes (~5% of HBM peak,
    docs/KERNELS.md) and dominates the 2-WL training backward (8.4M edge
    slots per epoch at collab scale). When `idx` is STATIC (host-known
    edge structure), pass `plan = SegmentPlan.build(idx, x.shape[0])
    .operands()`: the cotangent becomes per-row bucket gathers + reduces
    — pure gathers both directions."""
    del plan
    return _gather_fat_impl(x, idx)


def _gather_fat_impl(x, idx):
    tail = x.shape[1:]
    flat = x.reshape(x.shape[0], -1)
    out = flat[idx]  # plain gather (see take_rows_fat history note)
    return out.reshape(idx.shape + tail)


def _gather_planned_fwd(x, idx, plan):
    return _gather_fat_impl(x, idx), (idx, plan)


def _gather_planned_bwd(res, g):
    idx, plan = res
    _, inv_perm, slot_buckets = plan
    dx = _planned_fwd_impl(g, inv_perm, slot_buckets)

    def f0(a):
        if jnp.issubdtype(a.dtype, jnp.inexact):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, jax.dtypes.float0)

    return (dx, f0(idx), jax.tree_util.tree_map(f0, plan))


gather_rows_planned.defvjp(_gather_planned_fwd, _gather_planned_bwd)


# ---------------------------------------------------------------------------
# composed gather-sum: one gather per aggregation (fwd AND bwd)
# ---------------------------------------------------------------------------


def composed_operands(plan: "SegmentPlan", values: np.ndarray,
                      sentinel: int):
    """Composed bucket matrices for `gather_sum_composed`: the plan's
    slot-position buckets with `values[slotpos]` substituted (pads and
    invalid slots -> `sentinel`, the caller's zero row).

    Motivation (measured, 50k-node 2-WL step trace): the planned
    aggregation `segment_sum_planned(h[src] * coeff)` costs TWO
    S-slot gathers — h by src, then the messages by bucket position —
    and the gathers are transaction-bound (~10 GB/s at 64 B rows), 85%
    of the train step. Composing `src` into the bucket positions on the
    host gathers h DIRECTLY in bucket order: one S-gather. The GCN edge
    coefficient folds into row-wise multiplies because its dst factor
    is constant within a segment (dinv[dst] applied on the output rows,
    dinv[src]*mask applied on the input rows).
    """
    values_ext = np.append(
        np.asarray(values, np.int64), sentinel).astype(np.int32)
    buckets = tuple(
        jnp.asarray(values_ext[b]) for b in plan.slot_buckets)
    return (jnp.asarray(plan.inv_perm), buckets)


@jax.custom_vjp
def gather_sum_composed(x, fwd_ops, bwd_ops):
    """out[r] = sum over the r-th segment's slots of x[idx_slot], with
    slot->row indices composed on the host (`composed_operands`).

    `x` is [N, F] with row N reserved implicitly as zero (indices equal
    to N hit the appended zero row). `fwd_ops` aggregates by segment;
    `bwd_ops` is the TRANSPOSE structure (slots grouped by the gathered
    row, destination rows composed in) so the VJP is also one gather:
    dx[s] = sum over slots sourced at s of g[dst_slot].
    """
    del bwd_ops
    return _gather_sum_impl(x, fwd_ops)


def _gather_sum_impl(x, ops):
    inv_perm, buckets = ops
    tail = x.shape[1:]
    flat = x.reshape(x.shape[0], -1)
    f = flat.shape[1]
    ext = jnp.concatenate([flat, jnp.zeros((1, f), flat.dtype)], axis=0)
    parts = [
        ext[b.reshape(-1)].reshape(*b.shape, -1).sum(axis=1)
        for b in buckets
    ]
    parts.append(jnp.zeros((1, f), flat.dtype))
    out = jnp.concatenate(parts, axis=0)[inv_perm]
    return out.reshape((out.shape[0],) + tail)


def _gather_sum_fwd(x, fwd_ops, bwd_ops):
    return _gather_sum_impl(x, fwd_ops), (fwd_ops, bwd_ops, x.shape[0])


def _gather_sum_bwd(res, g):
    fwd_ops, bwd_ops, n_rows = res
    dx = _gather_sum_impl(g, bwd_ops)
    # the transpose structure covers n_rows source rows by construction
    assert dx.shape[0] == n_rows, (dx.shape, n_rows)

    def f0(a):
        if jnp.issubdtype(a.dtype, jnp.inexact):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, jax.dtypes.float0)

    return (dx,
            jax.tree_util.tree_map(f0, fwd_ops),
            jax.tree_util.tree_map(f0, bwd_ops))


gather_sum_composed.defvjp(_gather_sum_fwd, _gather_sum_bwd)


# ---------------------------------------------------------------------------
# one-hot-MXU (Pallas) segment sum — the small-slot-count regime
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 5))
def segment_sum_onehot(num_segments: int, msgs, dst, slots, valid,
                       interpret: bool = False):
    """Segment sum on the MXU: out[r] = sum_w valid[r,w] * msgs[slots[r,w]].

    `(slots, valid)` come from `SegmentPlan.ell_operands()`; `dst` is the
    plan's `dst_clipped` (used only by the backward gather). The forward
    runs the Pallas one-hot kernel (`ops.pallas_kernels.spmm_ell_pallas`):
    the gather becomes a block-dense {0,1} adjacency built in VMEM and
    multiplied on the systolic array — zero scatter, zero HBM gather
    traffic beyond the int32 slot matrix. Viable when `num_slots` is small
    enough for a [block_rows, num_slots] f32 tile in VMEM (~16k slots);
    `ops.spmm.choose_backend_1wl` encodes the rule.

    Equals `segment_sum_planned` for the same plan; the backward is the
    identical slot-partition gather (`g[dst]`).
    """
    return _onehot_fwd_impl(msgs, slots, valid, interpret)


def _onehot_fwd_impl(msgs, slots, valid, interpret):
    from linkpred_tpu.ops.pallas_kernels import spmm_ell_pallas

    ext = jnp.concatenate(
        [msgs, jnp.zeros((1, msgs.shape[1]), msgs.dtype)], axis=0
    )
    return spmm_ell_pallas(
        slots, valid.astype(jnp.float32), ext, interpret=interpret
    ).astype(msgs.dtype)


def _onehot_fwd(num_segments, msgs, dst, slots, valid, interpret):
    return _onehot_fwd_impl(msgs, slots, valid, interpret), (dst,)


def _onehot_bwd(num_segments, interpret, res, g):
    (dst,) = res
    g_ext = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0
    )
    return (g_ext[dst], None, None, None)


segment_sum_onehot.defvjp(_onehot_fwd, _onehot_bwd)
