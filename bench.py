"""Headline benchmark: TwoWL hyperparameter-sweep wall-clock vs reference.

The reference only ever trains TwoWL inside an Optuna sweep
(`TwoWL_work.py:112-132`: 10 sequential trials, mean ~133.4 s each on CPU
— `assets/time_twowl.txt`, BASELINE.md). The TPU-shaped equivalent is the
trial-major sweep (`pipelines.twowl_pipeline.refine_vmapped`): 32
(lr x dropout) configurations train SIMULTANEOUSLY in one compiled
program, trial axis in trailing dims (an outer vmap would serialize every
gather/scatter — docs/KERNELS.md). This bench times the full 32-trial x
1000-epoch sweep, warm (cold compile is done once outside the timer).

`value` = wall seconds for the whole 32-trial sweep; `vs_baseline` = the
per-trial speedup, reference_per_trial / (value / 32).

Prints ONE JSON line:
  {"metric": "twowl_sweep32_wall_seconds", "value": <s>, "unit": "s",
   "vs_baseline": <per-trial speedup>, ...extra diagnostic fields}
"""

import json
import time

REFERENCE_TRAIN_SECONDS = 133.4  # mean per-trial, assets/time_twowl.txt
REFERENCE_BEST_AUC = 0.8947


def main():
    import os

    import jax
    import numpy as np

    # persistent compilation cache: the axon remote compile of the fused
    # 1000-epoch scan can take minutes cold; cached reruns take seconds
    cache_dir = os.path.expanduser("~/.cache/jax_comp")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from linkpred_tpu.data import io
    from linkpred_tpu.data.twowl import build_twowl_data
    from linkpred_tpu.models import twowl as m
    from linkpred_tpu.pipelines.twowl_pipeline import (
        TwoWLRunConfig,
        refine_vmapped,
    )

    _, edges = io.load_fb_pages_food()
    n = int(edges.max()) + 1
    data = build_twowl_data(edges, n, rng=np.random.default_rng(0))
    cfg = m.TwoWLConfig(
        max_degree=data.max_degree,
        channels_1wl=24, channels_2wl=16, depth1=2, depth2=2,
        dp_emb=0.5, dp_1wl0=0.2, dp_1wl1=0.4, dp_2wl=0.1,
        act0=True, act1=False, learning_rate=0.01,
    )
    TRIALS = 32
    # warm-up: compile the chunked sweep scan out of the timed region
    # (identical shapes; chunk compiles once and is reused)
    refine_vmapped(data, cfg, TwoWLRunConfig(epochs=1000), n_trials=TRIALS,
                   verbose=False)

    t0 = time.perf_counter()
    res = refine_vmapped(data, cfg, TwoWLRunConfig(epochs=1000),
                         n_trials=TRIALS, verbose=False)
    seconds = time.perf_counter() - t0
    per_trial = seconds / TRIALS

    print(json.dumps({
        "metric": "twowl_sweep32_wall_seconds",
        "value": round(seconds, 3),
        "unit": "s",
        "vs_baseline": round(REFERENCE_TRAIN_SECONDS / per_trial, 2),
        "trials": TRIALS,
        "epochs_per_trial": 1000,
        "per_trial_seconds": round(per_trial, 3),
        "test_auc_winner": round(float(res["test_auc"]), 4),
        "best_val_auc": round(float(max(res["val_aucs"])), 4),
        "reference_per_trial_seconds": REFERENCE_TRAIN_SECONDS,
        "reference_best_auc": REFERENCE_BEST_AUC,
    }))


if __name__ == "__main__":
    main()
