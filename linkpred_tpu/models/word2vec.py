"""Skip-gram negative-sampling (word2vec) trainer, fully on-device.

Replaces gensim's C/Cython `Word2Vec` used by the reference for node
embeddings (`LogisticRegression_Linkprediction/utils/feature_extraction.py:17`
with `window=10, sg=1, workers=8`; `SEAL/config/data.py:66` with
`size=dim, window=10, sg=1, iter=1`) and Spark MLlib's Word2Vec
(`node2vec_spark/.../Word2vec.scala:35-39`).

Design: one jit-compiled `lax.scan` over SGD steps. Each step samples a
batch of (center, context) pairs *directly from the walk matrix on device* —
walk index, position, direction and offset are drawn per pair, with gensim's
"reduced window" triangular offset distribution reproduced by rejecting
offsets larger than a per-pair uniform window cap. Negatives come from the
unigram^0.75 noise distribution via a precomputed alias table. Updates are
plain SGD with gensim's linear learning-rate decay. There is no hogwild —
collisions within a batch are resolved exactly by scatter-add, which on TPU
is a segment-sum, so results are deterministic given the PRNG key.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linkpred_tpu.ops.walk import alias_setup_rows


@dataclasses.dataclass(frozen=True)
class SGNSConfig:
    dim: int = 100
    window: int = 10
    negatives: int = 5
    epochs: int = 5
    batch_size: int = 8192
    lr: float = 0.025
    min_lr: float = 1e-4
    ns_exponent: float = 0.75
    # Frequent-word subsampling threshold (gensim `sample`). Default off: on
    # random-walk corpora over small graphs the per-node frequency is ~1/N,
    # so gensim's default 1e-3 threshold only suppresses hub nodes — and
    # link-prediction features need hub embeddings trained, not starved.
    subsample: float = 0.0


def _noise_alias(counts: np.ndarray, ns_exponent: float):
    """Alias table over the unigram^0.75 noise distribution.

    Routed through the threaded C++ alias builder (`native.build_alias_rows`)
    when the host library is available: the pure-Python Vose loop costs
    seconds at a 235k-entry vocabulary and used to be paid *inside* every
    `train_sgns` call, contaminating throughput measurements (round-2
    bench). Fallback is the numpy/Python reference implementation."""
    from linkpred_tpu import native

    p = counts.astype(np.float64) ** ns_exponent
    p = p / p.sum()
    valid = np.ones((1, len(p)), dtype=bool)
    if native.available():
        J, q = native.build_alias_rows(p[None, :], valid)
    else:
        J, q = alias_setup_rows(p[None, :], valid)
    return J[0], q[0]


@dataclasses.dataclass(frozen=True)
class SGNSPrep:
    """Host-side preparation for one walk corpus: noise alias + subsample
    keep-probabilities. Build once per corpus (`prepare_sgns`) and reuse
    across `train_sgns` calls — the alias depends only on token counts, not
    on the PRNG key or schedule, so rebuilding it per call is pure waste
    (gensim likewise builds its cumulative noise table once in
    `make_cum_table`, reference `requirements.txt:13` dependency)."""

    noise_J: np.ndarray
    noise_q: np.ndarray
    keep: np.ndarray
    prep_seconds: float


def prepare_sgns(
    walks_np: np.ndarray, num_nodes: int, cfg: SGNSConfig = SGNSConfig()
) -> SGNSPrep:
    import time

    t0 = time.perf_counter()
    counts = np.bincount(walks_np.reshape(-1), minlength=num_nodes)
    noise_J, noise_q = _noise_alias(counts, cfg.ns_exponent)
    keep = _keep_prob(counts, cfg.subsample)
    return SGNSPrep(noise_J, noise_q, keep, time.perf_counter() - t0)


def _keep_prob(counts: np.ndarray, sample: float) -> np.ndarray:
    """gensim subsampling keep-probability per word:
    keep = (sqrt(f/t) + 1) * t/f, clipped to 1, where f is the corpus
    frequency and t the `sample` threshold."""
    total = counts.sum()
    if sample <= 0 or total == 0:
        return np.ones_like(counts, dtype=np.float32)
    f = np.maximum(counts, 1) / total
    keep = (np.sqrt(f / sample) + 1) * (sample / f)
    return np.minimum(keep, 1.0).astype(np.float32)


@partial(jax.jit, static_argnames=("cfg", "num_steps"), donate_argnums=(1, 2))
def _train(
    key,
    w_in: jnp.ndarray,
    w_out: jnp.ndarray,
    walks: jnp.ndarray,
    noise_J: jnp.ndarray,
    noise_q: jnp.ndarray,
    keep: jnp.ndarray,
    cfg: SGNSConfig,
    num_steps: int,
):
    num_nodes = w_in.shape[0]
    W, L = walks.shape
    B, K = cfg.batch_size, cfg.negatives
    lrs = jnp.linspace(cfg.lr, cfg.min_lr, num_steps)

    def step(carry, inp):
        w_in, w_out = carry
        k, lr = inp
        ks = jax.random.split(k, 7)

        widx = jax.random.randint(ks[0], (B,), 0, W)
        t = jax.random.randint(ks[1], (B,), 0, L)
        direction = jax.random.randint(ks[2], (B,), 0, 2) * 2 - 1
        mag = jax.random.randint(ks[3], (B,), 1, cfg.window + 1)
        cap = jax.random.randint(ks[4], (B,), 1, cfg.window + 1)
        ctx_t = t + direction * mag
        valid = (mag <= cap) & (ctx_t >= 0) & (ctx_t < L)
        ctx_t = jnp.clip(ctx_t, 0, L - 1)

        center = walks[widx, t]
        context = walks[widx, ctx_t]
        valid &= center != context  # stalled-walker self pairs

        # subsampling: drop pairs where either endpoint is downsampled
        u = jax.random.uniform(ks[5], (2, B))
        valid &= (u[0] < keep[center]) & (u[1] < keep[context])

        # negatives via alias draw over the noise distribution
        un = jax.random.uniform(ks[6], (2, B, K))
        kk = jnp.minimum((un[0] * num_nodes).astype(jnp.int32), num_nodes - 1)
        neg = jnp.where(un[1] < noise_q[kk], kk, noise_J[kk]).astype(jnp.int32)

        vc = w_in[center]  # [B, D]
        uo = w_out[context]  # [B, D]
        un_ = w_out[neg]  # [B, K, D]

        pos_score = jnp.einsum("bd,bd->b", vc, uo)
        neg_score = jnp.einsum("bd,bkd->bk", vc, un_)
        g_pos = (jax.nn.sigmoid(pos_score) - 1.0) * valid  # [B]
        g_neg = jax.nn.sigmoid(neg_score) * valid[:, None]  # [B, K]

        grad_vc = g_pos[:, None] * uo + jnp.einsum("bk,bkd->bd", g_neg, un_)
        grad_uo = g_pos[:, None] * vc
        grad_un = g_neg[:, :, None] * vc[:, None, :]

        # exact scatter-add of colliding rows
        w_in = w_in.at[center].add(-lr * grad_vc)
        w_out = w_out.at[context].add(-lr * grad_uo)
        w_out = w_out.at[neg.reshape(-1)].add(
            -lr * grad_un.reshape(B * K, -1)
        )
        return (w_in, w_out), None

    keys = jax.random.split(key, num_steps)
    (w_in, w_out), _ = jax.lax.scan(step, (w_in, w_out), (keys, lrs))
    return w_in, w_out


def train_sgns(
    key,
    walks,
    num_nodes: int,
    cfg: SGNSConfig = SGNSConfig(),
    prep: SGNSPrep | None = None,
) -> np.ndarray:
    """Train SGNS embeddings from a walk matrix; returns [num_nodes, dim].

    Nodes never visited by a walk keep their (tiny random) init — the SEAL
    pipeline overwrites those rows with the average embedding, matching
    reference `SEAL/config/data.py:68-76`.

    Pass a `prepare_sgns` result as `prep` to skip the host-side noise
    -table build (it depends only on the corpus).
    """
    walks_np = np.asarray(walks)
    if prep is None:
        prep = prepare_sgns(walks_np, num_nodes, cfg)
    noise_J, noise_q, keep = prep.noise_J, prep.noise_q, prep.keep

    # Batch-synchronous SGD sums colliding row updates; on tiny
    # vocabularies a large batch piles O(batch/num_nodes) sequential-SGD
    # steps into one linearized jump and diverges. Cap the batch at ~16
    # pair-candidates per node (the fb-pages-food collision rate that is
    # empirically stable at gensim's lr).
    batch_size = max(64, min(cfg.batch_size, 16 * num_nodes))
    if batch_size != cfg.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=batch_size)

    # Pair-candidate budget per epoch. gensim trains ~2*E[reduced window]
    # ≈ `window` pairs per token; our sampler proposes candidates of which
    # only ~40-55% are valid (offset cap + range + self-pair masks), so
    # budget `2 * window` candidates per token to land near gensim's
    # effective update count.
    pairs_per_epoch = walks_np.size * cfg.window * 2
    num_steps = max(int(cfg.epochs * pairs_per_epoch / cfg.batch_size), 1)

    k_init, k_train = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    w_in = (
        jax.random.uniform(k_init, (num_nodes, cfg.dim), minval=-0.5, maxval=0.5)
        / cfg.dim
    ).astype(jnp.float32)
    w_out = jnp.zeros((num_nodes, cfg.dim), dtype=jnp.float32)

    w_in, _ = _train(
        k_train,
        w_in,
        w_out,
        jnp.asarray(walks_np),
        jnp.asarray(noise_J),
        jnp.asarray(noise_q),
        jnp.asarray(keep),
        cfg,
        num_steps,
    )
    return np.asarray(w_in)
