"""Halo-exchange node-sharded SpMM: numerics, gradients, traffic bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linkpred_tpu.data.graph import Graph
from linkpred_tpu.parallel.halo import HaloLayout, spmm_halo, spmm_halo_sym
from linkpred_tpu.parallel.mesh import make_mesh


def _rand_sym_graph(rng, n=400, e=1600):
    lo = rng.integers(0, n, e)
    hi = rng.integers(0, n, e)
    keep = lo != hi
    g = Graph.from_undirected_edges(lo[keep], hi[keep], num_nodes=n)
    # symmetric normalization (what gcn_scale feeds the kernel)
    d = np.asarray(g.degree, np.float64) + 1.0
    inv_sqrt = (1.0 / np.sqrt(d)).astype(np.float32)
    w = inv_sqrt[:, None] * inv_sqrt[np.asarray(g.nbr)]
    import dataclasses

    return dataclasses.replace(g, nbr_weight=np.ascontiguousarray(w))


def _dense_ref(g, x_old):
    """Dense aggregation in OLD node order."""
    n = g.num_nodes
    a = np.zeros((n, n), np.float64)
    w = g.nbr_weight
    for v in range(n):
        for s in range(g.nbr.shape[1]):
            if g.nbr_mask[v, s]:
                a[v, g.nbr[v, s]] += w[v, s]
    return a @ x_old


class TestHaloSpmm:
    @pytest.mark.parametrize("reorder", [True, False])
    def test_matches_dense(self, rng, reorder):
        g = _rand_sym_graph(rng)
        mesh = make_mesh(shape=(1, 8))
        layout = HaloLayout.build(g, 8, reorder=reorder)
        x_old = rng.standard_normal((g.num_nodes, 16)).astype(np.float32)
        x_new = jnp.asarray(x_old[layout.order])
        out = np.asarray(spmm_halo(
            mesh, x_new, g.num_nodes, layout.rows_per_shard,
            layout.ghost_capacity, *layout.operands()))
        ref = _dense_ref(g, x_old)[layout.order]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_locality_ordering_shrinks_halo_banded(self, rng):
        """Auto ordering must collapse the exchange on a banded graph
        (ring of chained blocks — the RCM-favoring regime) despite
        scrambled input labels."""
        blocks, bs = 16, 25
        pairs = []
        for b in range(blocks):
            base = b * bs
            for i in range(bs):
                for j in range(i + 1, min(i + 4, bs)):
                    pairs.append((base + i, base + j))
            pairs.append((base + bs - 1, ((b + 1) % blocks) * bs))
        pairs = np.asarray(pairs)
        n = blocks * bs
        perm = rng.permutation(n)  # scramble labels
        g = Graph.from_undirected_edges(
            perm[pairs[:, 0]], perm[pairs[:, 1]], num_nodes=n)
        lay = HaloLayout.build(g, 8, reorder=True)
        lay_raw = HaloLayout.build(g, 8, reorder=False)
        assert lay.ghost_capacity * 3 < lay_raw.ghost_capacity, (
            lay.ghost_capacity, lay_raw.ghost_capacity)
        # capacity (hence collective bytes) must be a small fraction of N
        assert lay.ghost_capacity < n // 8

    def test_locality_ordering_shrinks_halo_community(self):
        """Auto ordering must rediscover shuffled communities (the
        label-prop-favoring regime) and cut halo traffic accordingly."""
        from benchmarks.scaling import synth_community_graph

        n = 8000
        lo, hi = synth_community_graph(n, 32000, n_comm=32, seed=3)
        g = Graph.from_undirected_edges(lo, hi, num_nodes=n)
        lay = HaloLayout.build(g, 8, reorder=True)
        lay_raw = HaloLayout.build(g, 8, reorder=False)
        assert lay.edge_cut * 2 < lay_raw.edge_cut, (
            lay.edge_cut, lay_raw.edge_cut)
        assert lay.ghost_capacity * 2 < lay_raw.ghost_capacity, (
            lay.ghost_capacity, lay_raw.ghost_capacity)

    def test_sym_vjp_padded_input_shape(self, rng):
        """Gradient of spmm_halo_sym on a PRE-PADDED [rows*S, F] input must
        come back [rows*S, F] (round-4 review: the pad guard compared
        against the cotangent's rows and silently returned [num_nodes, F])."""
        g = _rand_sym_graph(rng, n=10, e=30)
        mesh = make_mesh(shape=(1, 8))
        layout = HaloLayout.build(g, 8)
        pad_total = layout.rows_per_shard * 8
        assert pad_total > g.num_nodes
        x = jnp.asarray(
            rng.standard_normal((pad_total, 4)).astype(np.float32))

        def loss(x):
            return jnp.sum(spmm_halo_sym(
                mesh, x, g.num_nodes, layout.rows_per_shard,
                layout.ghost_capacity, layout.operands()) ** 2)

        gx = jax.grad(loss)(x)
        assert gx.shape == x.shape, (gx.shape, x.shape)
        # padded rows carry zero gradient
        np.testing.assert_allclose(
            np.asarray(gx[g.num_nodes:]), 0.0, atol=1e-7)

    def test_sym_vjp_matches_autodiff(self, rng):
        g = _rand_sym_graph(rng, n=200, e=700)
        mesh = make_mesh(shape=(1, 8))
        layout = HaloLayout.build(g, 8)
        ops = layout.operands()
        x = jnp.asarray(
            rng.standard_normal((g.num_nodes, 8)).astype(np.float32))
        t = jnp.asarray(
            rng.standard_normal((g.num_nodes, 8)).astype(np.float32))

        def loss_sym(x):
            return jnp.sum(spmm_halo_sym(
                mesh, x, g.num_nodes, layout.rows_per_shard,
                layout.ghost_capacity, ops) * t)

        def loss_plain(x):
            return jnp.sum(spmm_halo(
                mesh, x, g.num_nodes, layout.rows_per_shard,
                layout.ghost_capacity, *ops) * t)

        ga = jax.grad(loss_sym)(x)
        gb = jax.grad(loss_plain)(x)  # XLA's own VJP of the gather graph
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)
