"""Batched enclosing-subgraph extraction + DRNL labeling (SEAL data path).

TPU-native redesign of the reference's per-link Python loop
(`SEAL/config/subgraph.py:75-82` calls `extract_subgraph` once per pair, each
doing networkx neighbor walks and per-node `nx.shortest_path_length` for the
DRNL tags, `SEAL/utils/utils.py:35-54`). Here:

- **Extraction is one vectorized pass over all pairs at once**: hop
  frontiers are boolean matrix products against the adjacency, and the
  `max_neighbors` random-truncation of the reference
  (`subgraph.py:118-131`) becomes a random-priority top-k per row — every
  pair is processed simultaneously, no Python loop over links.
- **DRNL is a batched multi-source BFS** under `jit`: distances from both
  target endpoints for all subgraphs advance together in one `lax.scan` of
  masked boolean matmuls, then the closed-form tag
  `1 + min(dx,dy) + (d//2)*((d//2)+(d%2)-1)` (reference `utils.py:50-52`)
  is applied elementwise. Unreachable nodes tag 0, endpoints tag 1 —
  matching the reference exactly (verified property-test vs a shortest-path
  oracle in `tests/test_subgraph.py`).
- Everything is **capacity-padded to `max_neighbors` nodes** so the whole
  dataset is a static-shaped `[P, K, K]` tensor stack ready for the batched
  DGCNN (`linkpred_tpu.models.seal`) — where the reference feeds one
  variable-sized subgraph per `sess.run` (`SEAL/model/gnn.py:172-181`).

The target link is masked out of every subgraph (`sub_adj[0,1]=0`, reference
`subgraph.py:137`) so the model cannot read the label off the adjacency.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linkpred_tpu.utils import metrics

_INF = np.int32(np.iinfo(np.int32).max // 4)


# ---------------------------------------------------------------------------
# hop selection heuristic
# ---------------------------------------------------------------------------


def auto_hop(
    adj: np.ndarray,
    test_pos: np.ndarray,
    test_neg: np.ndarray,
) -> int:
    """Pick hop 1 vs 2 by comparing Common-Neighbors vs Adamic-Adar AUC on
    the test split (reference `SEAL/config/subgraph.py:45-63`): CN wins ->
    hop 1, AA wins -> hop 2."""
    a = adj.astype(np.float32)
    cn = a @ a
    # Adamic-Adar: sum over common neighbors k of 1/log(deg_k). (The
    # reference's broadcasting at `subgraph.py:50` divides by log(deg) of the
    # *endpoint* column instead of the intermediate node — a bug we do not
    # replicate; the heuristic's intent is AA.)
    with np.errstate(divide="ignore", invalid="ignore"):
        a_log = a / np.log(a.sum(axis=1))[:, None]
    a_log[~np.isfinite(a_log)] = 0.0
    aa = a @ a_log

    def _auc(scores):
        s = np.concatenate(
            [scores[test_pos[:, 0], test_pos[:, 1]], scores[test_neg[:, 0], test_neg[:, 1]]]
        )
        y = np.concatenate([np.ones(len(test_pos)), np.zeros(len(test_neg))])
        return metrics.roc_auc_score(y, s)

    return 1 if _auc(cn) > _auc(aa) else 2


def auto_hop_csr(
    indptr: np.ndarray,
    indices: np.ndarray,
    test_pos: np.ndarray,
    test_neg: np.ndarray,
) -> int:
    """CSR variant of `auto_hop` for graphs too large for a dense adjacency:
    CN and AA scores are evaluated only at the test pairs via sorted-row
    intersections (identical scores to the dense matmuls at those entries,
    reference `SEAL/config/subgraph.py:45-63`)."""
    deg = np.diff(indptr).astype(np.float64)
    with np.errstate(divide="ignore"):
        inv_log = 1.0 / np.log(deg)
    inv_log[~np.isfinite(inv_log)] = 0.0

    def _scores(pairs):
        cn = np.empty(len(pairs), dtype=np.float64)
        aa = np.empty(len(pairs), dtype=np.float64)
        for i, (u, v) in enumerate(pairs):
            nu = indices[indptr[u] : indptr[u + 1]]
            nv = indices[indptr[v] : indptr[v + 1]]
            common = np.intersect1d(nu, nv, assume_unique=False)
            cn[i] = len(common)
            aa[i] = inv_log[common].sum()
        return cn, aa

    cn_p, aa_p = _scores(np.asarray(test_pos))
    cn_n, aa_n = _scores(np.asarray(test_neg))
    y = np.concatenate([np.ones(len(test_pos)), np.zeros(len(test_neg))])
    auc_cn = metrics.roc_auc_score(y, np.concatenate([cn_p, cn_n]))
    auc_aa = metrics.roc_auc_score(y, np.concatenate([aa_p, aa_n]))
    return 1 if auc_cn > auc_aa else 2


# ---------------------------------------------------------------------------
# batched extraction
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SubgraphBatch:
    """Padded stack of enclosing subgraphs.

    nodes: [P, K] int32 original node ids (row 0 = u, row 1 = v), pad 0.
    node_mask: [P, K] bool, True where a real node.
    adj: [P, K, K] uint8 subgraph adjacency with the target link masked.
    sizes: [P] int32 real node counts.
    tags: [P, K] int32 compacted DRNL tags (pad rows get tag 0).
    tags_size: number of distinct tags after compaction.
    """

    nodes: np.ndarray
    node_mask: np.ndarray
    adj: np.ndarray
    sizes: np.ndarray
    tags: np.ndarray
    tags_size: int


def _random_truncate(cand: np.ndarray, budget: np.ndarray, rng) -> np.ndarray:
    """Keep at most `budget[p]` True entries per row of `cand`, chosen
    uniformly at random — the vectorized analog of the reference's
    shuffle-then-slice truncation (`subgraph.py:128-129`)."""
    P, N = cand.shape
    prio = rng.random((P, N), dtype=np.float32)
    prio[~cand] = -1.0
    order = np.argsort(-prio, axis=1)  # candidates first, random order
    rank = np.empty_like(order)
    np.put_along_axis(rank, order, np.broadcast_to(np.arange(N), (P, N)).copy(), axis=1)
    return cand & (rank < budget[:, None])


def extract_subgraphs(
    pairs: np.ndarray,
    adj_bool: np.ndarray,
    hop: int,
    max_neighbors: int = 100,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized k-hop enclosing-subgraph node selection for all pairs.

    Returns (nodes [P, K], node_mask [P, K], adj [P, K, K], sizes [P]) with
    K = max_neighbors. Semantics follow reference `subgraph.py:105-137`:
    start from {u, v}, add hop-frontier neighbors, randomly truncate once
    the `max_neighbors` cap is hit, order nodes as [u, v, rest], take the
    induced adjacency, and zero the (u, v) target entry.
    """
    rng = rng or np.random.default_rng(0)
    pairs = np.asarray(pairs, dtype=np.int64)
    P = pairs.shape[0]
    N = adj_bool.shape[0]
    K = max_neighbors

    u, v = pairs[:, 0], pairs[:, 1]
    selected = np.zeros((P, N), dtype=bool)
    selected[np.arange(P), u] = True
    selected[np.arange(P), v] = True

    for _ in range(int(hop)):
        frontier_nbrs = (selected.astype(np.float32) @ adj_bool.astype(np.float32)) > 0
        cand = frontier_nbrs & ~selected
        budget = K - selected.sum(axis=1)
        selected |= _random_truncate(cand, budget, rng)

    sizes = selected.sum(axis=1).astype(np.int32)

    # node order: [u, v, other selected nodes]; pad with 0 beyond `sizes`
    rest = selected.copy()
    rest[np.arange(P), u] = False
    rest[np.arange(P), v] = False
    nodes = np.zeros((P, K), dtype=np.int32)
    node_mask = np.zeros((P, K), dtype=bool)
    nodes[:, 0], nodes[:, 1] = u, v
    node_mask[:, 0] = True
    node_mask[:, 1] = True
    r, c = np.nonzero(rest)
    # position of each rest-node within its row, offset by the 2 endpoints
    row_start = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(rest.sum(axis=1), out=row_start[1:])
    pos = np.arange(len(r)) - row_start[r] + 2
    nodes[r, pos] = c
    node_mask[r, pos] = True

    sub_adj = adj_bool[nodes[:, :, None], nodes[:, None, :]].astype(np.uint8)
    sub_adj &= (node_mask[:, :, None] & node_mask[:, None, :]).astype(np.uint8)
    sub_adj[:, 0, 1] = 0
    sub_adj[:, 1, 0] = 0
    return nodes, node_mask, sub_adj, sizes


def extract_subgraphs_csr(
    pairs: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    num_nodes: int,
    hop: int,
    max_neighbors: int = 100,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """CSR-based enclosing-subgraph extraction — the scale path.

    Same semantics as `extract_subgraphs` (per-hop neighbor union of the
    selected set, uniform random truncation at the `max_neighbors` budget,
    node order [u, v, rest], target link masked) but over `indptr`/`indices`
    instead of a dense [N, N] adjacency: memory is O(P·K²), independent of
    N, so 235k-node graphs work where the dense path would need ~55 GB.
    Routed through the threaded C++ plane (`native.extract_subgraphs_csr`)
    when available; the numpy per-pair fallback is distribution-equivalent.
    Reference semantics: `SEAL/config/subgraph.py:105-137`.
    """
    from linkpred_tpu import native

    pairs = np.ascontiguousarray(pairs, dtype=np.int32)
    if native.available():
        return native.extract_subgraphs_csr(
            indptr, indices, num_nodes, pairs, int(hop), max_neighbors, seed
        )

    rng = np.random.default_rng(seed)
    P, K = pairs.shape[0], max_neighbors
    nodes = np.zeros((P, K), dtype=np.int32)
    node_mask = np.zeros((P, K), dtype=bool)
    adj = np.zeros((P, K, K), dtype=np.uint8)
    sizes = np.zeros(P, dtype=np.int32)
    for p in range(P):
        u, v = int(pairs[p, 0]), int(pairs[p, 1])
        sel = [u] if u == v else [u, v]
        for _ in range(int(hop)):
            budget = K - len(sel)
            if budget <= 0:
                break
            sel_arr = np.asarray(sel, dtype=np.int64)
            cand = np.unique(
                np.concatenate(
                    [indices[indptr[w] : indptr[w + 1]] for w in sel]
                )
            )
            cand = cand[~np.isin(cand, sel_arr)]
            if len(cand) == 0:
                break
            if len(cand) > budget:
                cand = rng.choice(cand, size=budget, replace=False)
            sel.extend(int(c) for c in cand)
        sz = len(sel)
        sizes[p] = sz
        sel_arr = np.asarray(sel, dtype=np.int32)
        nodes[p, :sz] = sel_arr
        node_mask[p, :sz] = True
        local = {int(w): i for i, w in enumerate(sel_arr)}
        for i, w in enumerate(sel_arr):
            for x in indices[indptr[w] : indptr[w + 1]]:
                j = local.get(int(x))
                if j is not None:
                    adj[p, i, j] = 1
        if sz >= 2:
            adj[p, 0, 1] = 0
            adj[p, 1, 0] = 0
    return nodes, node_mask, adj, sizes


# ---------------------------------------------------------------------------
# batched DRNL labeling
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_steps",))
def drnl_tags(
    adj: jnp.ndarray,  # [P, K, K] uint8/bool, target link already masked
    node_mask: jnp.ndarray,  # [P, K] bool
    max_steps: int,
) -> jnp.ndarray:
    """Double-Radius Node Labeling for a padded batch of subgraphs.

    Two multi-source BFS sweeps (from node 0 and node 1 of every subgraph)
    advance simultaneously via masked boolean matmuls under `lax.scan`;
    distances then map to tags by the closed form of reference
    `SEAL/utils/utils.py:50-52`. Unreachable-from-either-endpoint -> 0,
    endpoints -> 1, padded nodes -> 0.
    """
    a = (adj > 0) & node_mask[:, :, None] & node_mask[:, None, :]
    P, K, _ = a.shape
    af = a.astype(jnp.float32)

    # reach[s, p, k]: source s in {0 (=u), 1 (=v)}
    reach0 = jnp.zeros((2, P, K), dtype=bool)
    reach0 = reach0.at[0, :, 0].set(True).at[1, :, 1].set(True)
    dist0 = jnp.where(reach0, 0, _INF).astype(jnp.int32)

    # Fixed-trip scan, NOT lax.while_loop: a while here hangs/crawls on the
    # axon TPU runtime (measured: a P=2048 while-BFS took ~256 s where this
    # scan is sub-second, and a fresh while compile wedged entirely), and a
    # BFS that has converged just keeps dist unchanged, so extra scan steps
    # are cheap no-op matmuls. Host-plane callers at scale use the C++ BFS
    # (`native.drnl_tags_batch`) instead and never enter this program.
    def step(carry, d):
        reach, dist = carry
        # neighbors of the reached set: [2, P, K] x [P, K, K]
        grown = jnp.einsum("spk,pkj->spj", reach.astype(jnp.float32), af) > 0
        new = grown & ~reach
        dist = jnp.where(new, d + 1, dist)
        return (reach | new, dist), None

    (_, dist), _ = jax.lax.scan(
        step, (reach0, dist0), jnp.arange(max_steps, dtype=jnp.int32)
    )

    dx, dy = dist[0], dist[1]  # [P, K]
    reachable = (dx < _INF) & (dy < _INF)
    d = dx + dy
    div, mod = d // 2, d % 2
    tag = 1 + jnp.minimum(dx, dy) + div * (div + mod - 1)
    tag = jnp.where(reachable, tag, 0)
    # endpoints always tag 1 (reference returns [1, 1] + tags)
    tag = tag.at[:, 0].set(1).at[:, 1].set(1)
    return jnp.where(node_mask, tag, 0).astype(jnp.int32)


def compact_tags(tags: np.ndarray, node_mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Map the observed tag vocabulary to contiguous ids 0..T-1 (reference
    `subgraph.py:90-101`). Padded entries keep id of tag 0 but their feature
    rows are masked downstream."""
    vocab = np.unique(tags[node_mask])
    if 0 not in vocab:
        vocab = np.concatenate([[0], vocab])
    lut = np.zeros(int(vocab.max()) + 1, dtype=np.int32)
    lut[vocab] = np.arange(len(vocab), dtype=np.int32)
    return lut[tags], int(len(vocab))


def build_subgraph_batch(
    pairs: np.ndarray,
    adj_bool: np.ndarray,
    hop: int,
    max_neighbors: int = 100,
    rng: np.random.Generator | None = None,
) -> SubgraphBatch:
    """Full extraction + DRNL for a set of target pairs."""
    nodes, node_mask, adj, sizes = extract_subgraphs(
        pairs, adj_bool, hop, max_neighbors, rng
    )
    tags = np.asarray(
        drnl_tags(jnp.asarray(adj), jnp.asarray(node_mask), max_steps=max_neighbors)
    )
    tags, tags_size = compact_tags(tags, node_mask)
    return SubgraphBatch(
        nodes=nodes,
        node_mask=node_mask,
        adj=adj,
        sizes=sizes,
        tags=tags,
        tags_size=tags_size,
    )


def build_subgraph_batch_csr(
    pairs: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    num_nodes: int,
    hop: int,
    max_neighbors: int = 100,
    seed: int = 0,
    drnl_chunk: int = 4096,
) -> SubgraphBatch:
    """Scale-path analog of `build_subgraph_batch`: CSR extraction + DRNL
    in the threaded C++ host plane (`native.drnl_tags_batch` — a 100-node
    BFS is host-sized integer work; shipping [P, K, K] stacks to the chip
    for it costs more in transfer than the labeling itself). Falls back to
    the jit BFS in `drnl_chunk`-pair chunks when the library is absent."""
    from linkpred_tpu import native

    nodes, node_mask, adj, sizes = extract_subgraphs_csr(
        pairs, indptr, indices, num_nodes, hop, max_neighbors, seed
    )
    if native.available():
        tags = native.drnl_tags_batch(adj, node_mask, sizes)
    else:
        P = len(nodes)
        tag_chunks = []
        for s in range(0, P, drnl_chunk):
            e = min(s + drnl_chunk, P)
            tag_chunks.append(
                np.asarray(
                    drnl_tags(
                        jnp.asarray(adj[s:e]),
                        jnp.asarray(node_mask[s:e]),
                        max_steps=max_neighbors,
                    )
                )
            )
        tags = np.concatenate(tag_chunks, axis=0)
    tags, tags_size = compact_tags(tags, node_mask)
    return SubgraphBatch(
        nodes=nodes, node_mask=node_mask, adj=adj, sizes=sizes,
        tags=tags, tags_size=tags_size,
    )


# ---------------------------------------------------------------------------
# GNN input assembly
# ---------------------------------------------------------------------------


def gnn_inputs(
    batch: SubgraphBatch,
    embedding: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assemble (d_inv [P, K], a_tilde [P, K, K], x [P, K, F]) for the DGCNN.

    Mirrors reference `SEAL/config/data.py:81-145`: A-tilde = A + I,
    D-inverse of the row sums (kept as a vector — D is diagonal, so
    `D^-1 @ M` is a row scale), X = one-hot DRNL tag concat node2vec
    embedding rows. Padded nodes get self-loop-only rows and zero features,
    so their activations stay exactly zero through every tanh layer.
    """
    P, K = batch.tags.shape
    eye = np.eye(K, dtype=np.float32)
    a_tilde = batch.adj.astype(np.float32) + eye[None]
    d_inv = 1.0 / a_tilde.sum(axis=2)

    x = np.eye(batch.tags_size, dtype=np.float32)[batch.tags]  # [P, K, T]
    x *= batch.node_mask[:, :, None]
    if embedding is not None:
        emb = embedding[batch.nodes].astype(np.float32)
        emb *= batch.node_mask[:, :, None]
        x = np.concatenate([x, emb], axis=2)
    return d_inv.astype(np.float32), a_tilde, x
