"""Sharded random-walk generation — the mesh analog of Spark node2vec.

The reference's distributed walks shuffle the whole walk frontier through
an RDD `join` against edge attributes once per step
(`node2vec_spark/.../Node2vec.scala:103-124`, 200 partitions). On a TPU
mesh the alias tables and neighbor matrix are replicated (they are the
broadcast variables of `Node2vec.scala:32-35`) and the *walker* axis is
sharded across every device; each step is then purely local gathers — zero
collectives until the skip-gram pair stage, which is itself data-parallel.
For graphs whose tables exceed a chip's HBM the tables shard over ``edge``
and the gathers become `all_to_all` frontier exchanges; at fb-pages-food
scale replication is the speed-of-light layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linkpred_tpu.ops.walk import WalkEngine, simulate_walks


def sharded_walks(
    mesh: Mesh,
    engine: WalkEngine,
    key: jax.Array,
    num_walks: int,
    walk_length: int,
) -> jnp.ndarray:
    """Run `num_walks` walks from every node with the walker axis sharded
    over the whole mesh. Returns [num_walks * N, walk_length] int32."""
    n = engine.graph.num_nodes
    total = num_walks * n
    axis_sizes = [mesh.shape[a] for a in mesh.axis_names]
    n_dev = 1
    for s in axis_sizes:
        n_dev *= s
    pad = (-total) % n_dev
    starts = jnp.tile(jnp.arange(n, dtype=jnp.int32), num_walks)
    starts = jnp.pad(starts, (0, pad))  # padded walkers start at node 0

    walker_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    repl = NamedSharding(mesh, P())
    starts = jax.device_put(starts, walker_sharding)
    tables = [
        jax.device_put(a, repl)
        for a in (
            engine.nbr, engine.indptr, engine.degree,
            engine.node_J, engine.node_q, engine.edge_J, engine.edge_q,
        )
    ]
    out = simulate_walks(key, starts, *tables, walk_length)
    return out[: total]
