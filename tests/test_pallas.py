"""Pallas kernel numerics (interpret mode on the CPU mesh; the same kernel
compiles for TPU via Mosaic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from linkpred_tpu.ops.pallas_kernels import spmm_ell_auto, spmm_ell_pallas


class TestPallasSpMM:
    def test_matches_dense(self, rng):
        n, d, f = 70, 9, 20
        nbr = rng.integers(0, n, (n, d)).astype(np.int32)
        mask = rng.random((n, d)) < 0.6
        x = rng.standard_normal((n, f)).astype(np.float32)
        out = np.asarray(
            spmm_ell_pallas(
                jnp.asarray(nbr), jnp.asarray(mask, dtype=np.float32),
                jnp.asarray(x), block_rows=32, block_feats=16, interpret=True,
            )
        )
        dense = np.zeros((n, f), dtype=np.float32)
        for i in range(n):
            for k in range(d):
                if mask[i, k]:
                    dense[i] += x[nbr[i, k]]
        np.testing.assert_allclose(out, dense, rtol=1e-5, atol=1e-5)

    def test_weighted(self, rng):
        n, d, f = 33, 5, 8
        nbr = rng.integers(0, n, (n, d)).astype(np.int32)
        w = rng.random((n, d)).astype(np.float32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        out = np.asarray(
            spmm_ell_pallas(
                jnp.asarray(nbr), jnp.asarray(w), jnp.asarray(x),
                block_rows=16, block_feats=8, interpret=True,
            )
        )
        dense = np.zeros((n, f), dtype=np.float32)
        for i in range(n):
            for k in range(d):
                dense[i] += w[i, k] * x[nbr[i, k]]
        np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-4)

    def test_auto_dispatch_on_fb_graph(self, fb_graph):
        g, _ = fb_graph
        rng = np.random.default_rng(0)
        x = rng.standard_normal((g.num_nodes, 32)).astype(np.float32)
        out = np.asarray(
            spmm_ell_auto(
                jnp.asarray(g.nbr), jnp.asarray(g.nbr_mask), jnp.asarray(x),
                block_rows=128,
            )
        )
        expect = g.dense_adjacency() @ x
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


class TestPallasSDDMM:
    def test_matches_dense(self, rng):
        from linkpred_tpu.ops.pallas_kernels import sddmm_pallas

        n, e, f = 50, 130, 24
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        y = rng.standard_normal((n, f)).astype(np.float32)
        out = np.asarray(
            sddmm_pallas(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x),
                jnp.asarray(y), block_edges=32, interpret=True,
            )
        )
        expect = (x[src] * y[dst]).sum(axis=1)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    def test_auto_self_scores(self, fb_graph, rng):
        from linkpred_tpu.ops.pallas_kernels import sddmm_auto

        g, _ = fb_graph
        x = rng.standard_normal((g.num_nodes, 16)).astype(np.float32)
        out = np.asarray(
            sddmm_auto(jnp.asarray(g.src[:500]), jnp.asarray(g.dst[:500]),
                       jnp.asarray(x))
        )
        expect = (x[g.src[:500]] * x[g.dst[:500]]).sum(axis=1)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
