from linkpred_tpu.pipelines.logistic_pipeline import run_logistic  # noqa: F401
from linkpred_tpu.pipelines.seal_pipeline import run_seal  # noqa: F401
from linkpred_tpu.pipelines.twowl_pipeline import run_twowl  # noqa: F401
