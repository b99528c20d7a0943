"""varnet_tpu — TPU-native variational PDE framework.

A ground-up JAX/XLA re-design with the capabilities of the reference
RizaXudayi/VarNet library (SURVEY.md): solves advection-diffusion PDEs with
a neural trial function trained on a variational (weak-form) loss built
from compactly-supported FEM test functions and Gauss-Legendre quadrature,
data-parallel over a TPU device mesh.
"""

from .api import VarNet
from .fem.assembly import (
    FixedData,
    FluxData,
    PointData,
    ProblemStatic,
    QuadData,
    build_fixed_data,
)
from .fem.element import HatQuadrature, MasterElement
from .geometry.domain import (
    BoxDomain3D,
    BoxDomainND,
    Domain1D,
    PolygonDomain2D,
    PrismDomain3D,
    RectangleDomain2D,
)
from .models.mlp import init_mlp, mlp_apply, mlp_value_and_jac
from .models.source import make_gaussian_source, make_mlp_source, make_mlp_source_xt
from .problems.adpde import ADPDE, MORVar, NeumannBC, RobinBC
from .train.loss import make_loss_fn
from .train.optim import OptimizerConfig
from .train.trainer import TrainResult

__version__ = "0.1.0"

__all__ = [
    "VarNet",
    "ADPDE",
    "MORVar",
    "NeumannBC",
    "RobinBC",
    "Domain1D",
    "BoxDomain3D",
    "BoxDomainND",
    "PolygonDomain2D",
    "PrismDomain3D",
    "RectangleDomain2D",
    "MasterElement",
    "HatQuadrature",
    "build_fixed_data",
    "FixedData",
    "QuadData",
    "PointData",
    "FluxData",
    "ProblemStatic",
    "init_mlp",
    "mlp_apply",
    "mlp_value_and_jac",
    "make_loss_fn",
    "OptimizerConfig",
    "TrainResult",
    "make_mlp_source",
    "make_mlp_source_xt",
    "make_gaussian_source",
]
