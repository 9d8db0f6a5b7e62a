from linkpred_tpu.pipelines.logistic_pipeline import run_logistic  # noqa: F401
