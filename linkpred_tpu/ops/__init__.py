from linkpred_tpu.ops.segment import segment_sum, degree_from_edges  # noqa: F401
from linkpred_tpu.ops.spmm import spmm_coo, spmm_ell, gcn_aggregate  # noqa: F401
from linkpred_tpu.ops.sddmm import sddmm_coo  # noqa: F401
from linkpred_tpu.ops.pallas_kernels import spmm_ell_pallas, sddmm_pallas  # noqa: F401
