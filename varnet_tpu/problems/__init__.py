from .adpde import ADPDE, MORVar, eval_field
from .analytic import (
    steady_adr_1d,
    contaminant_transport_2d,
    inverse_source_2d,
    steady_ad_1d,
    steady_ad_2d,
    transient_ad_1d,
    transient_ad_2d,
)
