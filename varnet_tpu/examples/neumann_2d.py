"""2-D steady AD with MIXED boundary conditions: Dirichlet on three
edges, Neumann flux data on the right edge (beyond-reference capability:
the reference is Dirichlet-only — ``NeumannBC``).

Manufactured solution u = sin(pi x) sin(pi y) with
kappa du/dn = kappa pi cos(pi) sin(pi y) on x = 1.
Run: ``python -m varnet_tpu.examples.neumann_2d``.
"""

from ..problems.analytic import steady_ad_2d_neumann
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D steady AD, mixed Dirichlet/Neumann BCs",
                    epochs=30000, disc=30)
    p.add_argument("--kappa", type=float, default=0.1)
    args = p.parse_args(argv)
    case = steady_ad_2d_neumann(kappa=args.kappa)
    return run_case(case["pde"], args, weight=(1.0, 10.0))


if __name__ == "__main__":
    main()
