from .mlp import (
    ff_apply,
    ff_value_and_jac,
    init_mlp,
    init_siren,
    make_fourier_features,
    make_input_scaling,
    mlp_apply,
    mlp_value_and_jac,
    param_count,
)
from .source import make_gaussian_source, make_mlp_source, make_mlp_source_xt
