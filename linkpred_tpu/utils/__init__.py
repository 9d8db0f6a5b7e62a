from linkpred_tpu.utils import metrics, records, timer  # noqa: F401
