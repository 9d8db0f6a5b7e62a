"""A/B study: closing the bucketed-SpMM gap to the measured gather roofline.

Round-2 evidence (VERDICT Weak #2): `spmm_bucketed` ran at 46.8 GB/s f32 /
67.7 GB/s bf16 effective vs the repo's own measured random-row-gather
ceiling of 130-160 GB/s — the kernel must at minimum perform that exact
gather, so the ceiling is its floor time. Candidate explanations and the
variants that test them:

  A `einsum2d`  — the ORIGINAL `x[nb]` (2-D indices) + einsum reduce,
                  frozen here after production switched to the flat form.
  B `flat`      — gather with FLAT 1-D indices (`x[nb.ravel()]`) then
                  reshape+einsum: docs/KERNELS.md measured 2-D-operand
                  gathers fast only in the "trailing dims flattened" form;
                  2-D index arrays may take a slower XLA path.
  S `production`— `spmm.spmm_bucketed` exactly as shipped (currently the
                  flat form; benched separately so a future production
                  change keeps the A/B meaningful).
  V `vpu`       — flat gather + VPU multiply/reduce (no MXU einsum).
  C `cols`      — per-slot-column accumulation: w_b gathers of [n_b] rows
                  each (`x[nb[:, d]]`), multiply-add chain. Every gather is
                  the fastest measured form (2-D operand, 1-D indices) and
                  the add chain fuses — no [n_b, w_b, F] intermediate
                  anywhere.
  G `gather`    — bare `x[idx]` of the same slot count: the dtype-matched
                  roofline (floor time) all variants are scored against.
  P `pallas`    — fused per-row-DMA gather+reduce Pallas kernel
                  (`ops.pallas_kernels.spmm_rowdma_pallas`): the explicit
                  double-buffered design VERDICT asked to attempt. Expected
                  slower (one DMA descriptor per 256-512 B row cannot beat
                  XLA's native gather instruction) — measured here so the
                  negative result is recorded, not asserted.

Run: `python benchmarks/spmm_variants.py [--nodes N --edges E --feats F]`
Prints one JSON line per (variant, dtype) with GB/s and % of the
dtype-matched gather roofline.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def spmm_bucketed_einsum2d(x, num_nodes, *operands):
    """Variant A: the ORIGINAL 2-D-index gather form (`x[nb]` with nb
    [n_b, w_b]) + einsum reduce — frozen here verbatim after
    `spmm.spmm_bucketed` switched to the flat-index form in production,
    so the A/B this file exists for stays reproducible (advisor r3)."""
    import jax
    import jax.numpy as jnp

    prec = (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    out = jnp.zeros((num_nodes, x.shape[1]), x.dtype)
    for i in range(0, len(operands), 3):
        ids, nb, w = operands[i], operands[i + 1], operands[i + 2]
        agg = jnp.einsum("nd,ndf->nf", w.astype(x.dtype), x[nb],
                         precision=prec)
        out = out.at[ids].set(agg, unique_indices=True,
                              indices_are_sorted=True)
    return out


def spmm_bucketed_flat(x, num_nodes, *operands):
    """Variant B: flat-index gather + reshape + einsum."""
    import jax
    import jax.numpy as jnp

    prec = (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    out = jnp.zeros((num_nodes, x.shape[1]), x.dtype)
    for i in range(0, len(operands), 3):
        ids, nb, w = operands[i], operands[i + 1], operands[i + 2]
        g = x[nb.reshape(-1)].reshape(*nb.shape, x.shape[1])
        agg = jnp.einsum("nd,ndf->nf", w.astype(x.dtype), g, precision=prec)
        out = out.at[ids].set(agg, unique_indices=True,
                              indices_are_sorted=True)
    return out


def spmm_bucketed_vpu(x, num_nodes, *operands):
    """Variant V: flat gather + VPU multiply/reduce (no MXU einsum).

    The einsum reduce over the degree axis is tiny-FLOP work that the MXU
    runs as (for f32, precision HIGHEST) three bf16 passes; an elementwise
    multiply + axis-sum is VPU work that XLA can fuse directly onto the
    gather output without an MXU round-trip.
    """
    import jax.numpy as jnp

    out = jnp.zeros((num_nodes, x.shape[1]), x.dtype)
    for i in range(0, len(operands), 3):
        ids, nb, w = operands[i], operands[i + 1], operands[i + 2]
        g = x[nb.reshape(-1)].reshape(*nb.shape, x.shape[1])
        agg = jnp.sum(w.astype(x.dtype)[:, :, None] * g, axis=1)
        out = out.at[ids].set(agg, unique_indices=True,
                              indices_are_sorted=True)
    return out


def spmm_bucketed_cols(x, num_nodes, *operands):
    """Variant C: slot-column gathers + multiply-add accumulation."""
    import jax.numpy as jnp

    out = jnp.zeros((num_nodes, x.shape[1]), x.dtype)
    for i in range(0, len(operands), 3):
        ids, nb, w = operands[i], operands[i + 1], operands[i + 2]
        wd = w.astype(x.dtype)
        acc = wd[:, 0:1] * x[nb[:, 0]]
        for d in range(1, nb.shape[1]):
            acc = acc + wd[:, d : d + 1] * x[nb[:, d]]
        out = out.at[ids].set(acc, unique_indices=True,
                              indices_are_sorted=True)
    return out


def main():
    import os
    import sys
    import time

    import jax
    import jax.numpy as jnp

    from benchmarks.scaling import bench_chained, synth_powerlaw_graph
    from linkpred_tpu.data.graph import Graph
    from linkpred_tpu.ops import spmm

    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=235_000)
    ap.add_argument("--edges", type=int, default=1_200_000)
    ap.add_argument("--feats", type=int, default=128)
    ap.add_argument("--max-degree", type=int, default=64)
    ap.add_argument("--pallas", action="store_true",
                    help="also run the per-row-DMA Pallas attempt (slow)")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the on-device numerics cross-check (it is "
                         "also covered at small scale by tests/test_ops.py; "
                         "the combined 3-variant program is the slowest "
                         "axon remote compile in this file)")
    ap.add_argument("--variants", default="production,einsum2d,flat",
                    help="comma list from production,einsum2d,flat,vpu,cols,"
                         "pallas_rowdma ('production' = spmm.spmm_bucketed "
                         "as shipped; 'einsum2d' = the frozen 2-D-index "
                         "form it replaced). NOTE: 'cols' (width-unrolled "
                         "gather-fma chain) is a recorded NEGATIVE result "
                         "on the axon toolchain — its remote compile "
                         "exceeds 7 minutes at width 64 and was never "
                         "observed to finish inside the 10-min bench "
                         "window; run it only at small --max-degree")
    ap.add_argument("--k", type=int, default=40,
                    help="chained iterations per measurement (higher k "
                         "shrinks the dispatch-floor subtraction share)")
    args = ap.parse_args()

    # persistent compilation cache: cold axon remote compiles of the large
    # chained programs take minutes; cached reruns take seconds
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def note(msg):
        print(f"[variants +{time.perf_counter() - T0:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    T0 = time.perf_counter()

    lo, hi = synth_powerlaw_graph(args.nodes, args.edges, alpha=0.9, seed=0)
    g = Graph.from_undirected_edges(lo, hi, num_nodes=args.nodes)
    g = g.with_degree_cap(args.max_degree, rng=np.random.default_rng(1),
                          symmetric=True)
    n, e = g.num_nodes, g.num_edges
    layout = spmm.BucketedEll.from_graph(g)
    ops = layout.operands()
    slots = sum(int(b[1].size) for b in layout.buckets)
    note(f"graph ready: {n} nodes, {e} directed edges, {slots} slots")
    x32 = jnp.asarray(np.random.default_rng(2).standard_normal(
        (n, args.feats)).astype(np.float32))
    # roofline = chained SELF-gather: a [slots, F] table permuted by random
    # row indices, output feeding the next iteration (carry-shape-stable
    # inside bench_chained's fori_loop; gathering from a [n, F] table would
    # produce a [slots, F] output and break the carry)
    idx = jnp.asarray(np.random.default_rng(3).integers(
        0, slots, slots).astype(np.int32))
    g32 = jnp.asarray(np.random.default_rng(4).standard_normal(
        (slots, args.feats)).astype(np.float32))

    @jax.jit
    def row_gather(x, idx):
        return x[idx]

    def triples(fn):
        # the frozen historical variants predate the inv_perm assembly
        # operand (round 5) — strip it so they keep their verbatim form
        return lambda x, num_nodes, *o: fn(x, num_nodes, *o[1:])

    all_variants = {
        "production": spmm.spmm_bucketed,
        "einsum2d": triples(spmm_bucketed_einsum2d),
        "flat": triples(spmm_bucketed_flat),
        "vpu": triples(spmm_bucketed_vpu),
        "cols": triples(spmm_bucketed_cols),
    }
    selected = [v for v in args.variants.split(",") if v]
    if args.pallas and "pallas_rowdma" not in selected:
        selected.append("pallas_rowdma")  # --pallas alone must run it
    if "pallas_rowdma" in selected:
        from linkpred_tpu.ops.pallas_kernels import spmm_rowdma_bucketed

        all_variants["pallas_rowdma"] = triples(spmm_rowdma_bucketed)
    unknown = [v for v in selected if v not in all_variants]
    assert not unknown, f"unknown variants {unknown} (pass --pallas?)"
    variants = {k: all_variants[k] for k in selected}

    if not args.skip_check:
        # numerics cross-check once (f32) — ON DEVICE, scalar pullback
        # only: eager per-op dispatch and a [235k, 128] host read over the
        # axon tunnel take minutes (measured the hard way). Only the
        # variants actually SELECTED are checked (compiling 'cols' here
        # used to stall default runs for minutes — advisor r3), always
        # against the production kernel.
        check = {k: v for k, v in variants.items() if k != "production"}
        if check:
            @jax.jit
            def _max_err(x, *o):
                ref = spmm.spmm_bucketed(x, n, *o)
                errs = [jnp.abs(fn(x, n, *o) - ref).max()
                        for fn in check.values()]
                return jnp.stack(errs).max()

            err = float(_max_err(x32, *ops))
            assert err < 1e-3, err
            note(f"numerics check passed ({','.join(check)}): "
                 f"max |diff| {err:.2e}")

    for dtype, b, tag in ((jnp.float32, 4, "f32"), (jnp.bfloat16, 2, "bf16")):
        x = x32.astype(dtype)
        note(f"{tag}: benching gather roofline")
        dt_g = bench_chained(row_gather, g32.astype(dtype), idx, k=args.k)
        gather_traffic = 2 * slots * args.feats * b + slots * 4
        roof = gather_traffic / dt_g / 1e9
        for name, fn in variants.items():
            note(f"{tag}: benching {name}")
            try:
                dt = bench_chained(lambda x, *o: fn(x, n, *o), x, *ops,
                                   k=args.k)
            except Exception as ex:  # pallas may fail off-TPU
                print(json.dumps({"variant": name, "dtype": tag,
                                  "error": str(ex)[:200]}))
                continue
            eff = (e * args.feats * b + e * 4 + n * args.feats * b) / dt / 1e9
            actual = (slots * args.feats * b + slots * (4 + b)
                      + n * args.feats * b) / dt / 1e9
            print(json.dumps({
                "variant": name, "dtype": tag,
                "seconds": round(dt, 5),
                "edges_per_s": round(e / dt),
                "eff_gb_s": round(eff, 1),
                "actual_gb_s": round(actual, 1),
                "gather_roofline_gb_s": round(roof, 1),
                "pct_gather_roofline": round(100 * dt_g / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
