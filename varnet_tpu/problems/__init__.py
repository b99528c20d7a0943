from .adpde import ADPDE, MORVar, NeumannBC, RobinBC, eval_field
from .analytic import (
    steady_adr_1d,
    burgers_1d_steady,
    burgers_1d_transient,
    burgers_2d_front,
    burgers_2d_manufactured,
    contaminant_transport_2d,
    inverse_source_2d,
    steady_ad_1d,
    steady_ad_1d_neumann,
    steady_ad_2d,
    steady_ad_2d_neumann,
    steady_ad_3d,
    transient_ad_1d,
    transient_ad_2d,
    transient_ad_3d,
)
