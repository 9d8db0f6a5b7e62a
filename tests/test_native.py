"""Native C++ host-runtime bindings vs their Python reference paths."""

import numpy as np
import pytest

from linkpred_tpu import native
from linkpred_tpu.data.graph import Graph
from linkpred_tpu.ops.walk import AliasTables, alias_setup_rows

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@needs_native
class TestNative:
    def test_csr_ell_matches_python(self, rng):
        src = rng.integers(0, 40, 200)
        dst = rng.integers(0, 40, 200)
        order, indptr, nbr, mask, deg = native.build_csr_ell(src, dst, 40)
        g = Graph.from_edges(src, dst, num_nodes=40)
        np.testing.assert_array_equal(indptr, g.indptr)
        np.testing.assert_array_equal(deg, g.degree)
        d = min(nbr.shape[1], g.nbr.shape[1])
        np.testing.assert_array_equal(nbr[:, :d], g.nbr[:, :d])
        np.testing.assert_array_equal(mask[:, :d], g.nbr_mask[:, :d])

    def test_alias_rows_match_python(self, rng):
        valid = np.sort(rng.random((30, 6)) < 0.7, axis=1)[:, ::-1]
        probs = rng.random((30, 6)) * valid
        J1, q1 = native.build_alias_rows(probs, valid)
        J2, q2 = alias_setup_rows(probs, valid)
        np.testing.assert_array_equal(J1, J2)
        np.testing.assert_allclose(q1, q2, rtol=1e-6)

    def test_edge_bias_pq_tables(self, rng):
        """Native p/q edge bias == brute-force per-edge computation."""
        pairs = np.stack([rng.integers(0, 20, 60), rng.integers(0, 20, 60)], 1)
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        g = Graph.from_undirected_edges(pairs[:, 0], pairs[:, 1], num_nodes=20)
        p, q = 0.5, 2.0
        probs = native.edge_bias_probs(
            g.src, g.dst, g.nbr, g.nbr_mask, g.indptr, g.indices, p, q
        )
        has = g.has_edge_matrix()
        for e in range(g.num_edges):
            s, t = g.src[e], g.dst[e]
            for k in range(g.max_degree):
                if not g.nbr_mask[t, k]:
                    assert probs[e, k] == 0.0
                    continue
                x = g.nbr[t, k]
                expect = 1.0 / p if x == s else (1.0 if has[x, s] else 1.0 / q)
                assert probs[e, k] == pytest.approx(expect)

    def test_negative_sampling_excludes(self, rng):
        pairs = np.stack([rng.integers(0, 25, 80), rng.integers(0, 25, 80)], 1)
        neg = native.sample_negatives(pairs, 25, 50, seed=3)
        assert neg.shape == (50, 2)
        assert (neg[:, 0] < neg[:, 1]).all()
        ex = set()
        for u, v in pairs:
            ex.add((min(u, v), max(u, v)))
        for u, v in neg:
            assert (u, v) not in ex
        assert len({(u, v) for u, v in neg}) == 50

    def test_walk_engine_uses_native_pq(self, rng):
        """Biased-walk alias tables built through the native path still
        produce valid walks with correct bias structure."""
        import jax

        pairs = np.stack([rng.integers(0, 30, 90), rng.integers(0, 30, 90)], 1)
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        g = Graph.from_undirected_edges(pairs[:, 0], pairs[:, 1], num_nodes=30)
        from linkpred_tpu.ops.walk import WalkEngine

        eng = WalkEngine(g, p=0.25, q=4.0)
        w = np.asarray(eng.walks(jax.random.PRNGKey(0), 2, 10))
        has = g.has_edge_matrix()
        for row in w[:30]:
            for a, b in zip(row[:-1], row[1:]):
                assert a == b or has[a, b]
