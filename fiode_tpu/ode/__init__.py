from .adjoint import odeint_adjoint
from .integrate import OdeSolution, odeint, rms_error_ratio
from .tableaus import ADAPTIVE_SOLVERS, FIXED_SOLVERS, get_tableau
