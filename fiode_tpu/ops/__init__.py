from .cayley import cayley, cayley_conv_apply, cayley_linear_kernel, groupsort2
from .fused_rhs import fused_rhs, masked_cone_project, pack_rhs_params, rhs_reference
from .power_iteration import conv_sigma_max, power_iteration_conv, power_iteration_dense
from .simplex_qp import (
    box_project_mu,
    cone_project_mu,
    simplex_box_project,
    simplex_cone_project,
)
