from .certify import Certifier, CertifyResult
from .crown import crown_mlp_bounds, ibp_mlp_bounds, relu_relaxation
from .grid import (
    count_decision_boundary,
    enumerate_decision_boundary,
    grid_for_label,
)
from .ibp_qp import (
    ibp_cbf_qp,
    ibp_cbf_qp_band,
    ibp_cbf_qp_individual,
    ibp_sigmoid,
    worst_case_vdot,
)
from .interval import IV, iv
from .refine import RefineStats, refine_uncertified
