"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linkpred_tpu.data.graph import Graph
from linkpred_tpu.ops.walk import WalkEngine
from linkpred_tpu.parallel import make_mesh
from linkpred_tpu.parallel.spmm_shard import pad_edges_for_mesh, spmm_edge_partitioned
from linkpred_tpu.parallel.walks import sharded_walks


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestMesh:
    def test_shape(self, mesh):
        assert dict(mesh.shape) == {"data": 4, "edge": 2}


class TestShardedSpMM:
    def test_matches_dense(self, mesh, rng):
        n, e, f = 50, 200, 16
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        w = rng.random(e).astype(np.float32)
        (src_p, dst_p, w_p), mask = pad_edges_for_mesh(
            [jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)], mesh.shape["edge"]
        )
        out = np.asarray(
            spmm_edge_partitioned(
                mesh, src_p, dst_p, jnp.asarray(x), n,
                edge_weight=w_p, mask=mask,
            )
        )
        dense = np.zeros((n, f), dtype=np.float32)
        for s, d, ww in zip(src, dst, w):
            dense[d] += ww * x[s]
        np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-4)


class TestShardedWalks:
    def test_walks_are_valid_paths(self, mesh, rng):
        pairs = np.stack([rng.integers(0, 30, 80), rng.integers(0, 30, 80)], axis=1)
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        g = Graph.from_undirected_edges(pairs[:, 0], pairs[:, 1], num_nodes=30)
        eng = WalkEngine(g)
        w = np.asarray(sharded_walks(mesh, eng, jax.random.PRNGKey(0), 3, 8))
        assert w.shape == (3 * 30, 8)
        has = g.has_edge_matrix()
        for row in w[:40]:
            for a, b in zip(row[:-1], row[1:]):
                assert a == b or has[a, b]


class TestDryrun:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] > 0


class TestNodeShardedBucketed:
    def test_matches_dense(self, mesh, rng):
        from linkpred_tpu.parallel.spmm_shard import (
            build_node_sharded_buckets,
            spmm_node_sharded,
        )

        n = 77  # not divisible by the edge axis -> exercises row padding
        pairs = np.stack(
            [rng.integers(0, n, 300), rng.integers(0, n, 300)], axis=1
        )
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        g = Graph.from_undirected_edges(pairs[:, 0], pairs[:, 1], num_nodes=n)
        x = rng.standard_normal((n, 16)).astype(np.float32)
        rows, widths, stacked = build_node_sharded_buckets(
            g, mesh.shape["edge"]
        )
        out = np.asarray(
            spmm_node_sharded(
                mesh, jnp.asarray(x), n, rows,
                *[jnp.asarray(a) for a in stacked],
            )
        )
        dense = g.dense_adjacency() @ x
        np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-4)
