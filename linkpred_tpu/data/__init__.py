from linkpred_tpu.data.graph import Graph  # noqa: F401
from linkpred_tpu.data import io, split  # noqa: F401
