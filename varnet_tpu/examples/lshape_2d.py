"""Steady AD on a non-convex L-shaped polygon (geometry parity demo).

The reference supports non-convex polygon domains with per-edge Dirichlet
data (SURVEY.md §0 item 8); this example exercises exactly that: an
L-shaped domain, uniform flow around the inner corner, a Gaussian source,
zero Dirichlet walls.  No closed form — loss convergence + plots are the
output.  Run: ``python -m varnet_tpu.examples.lshape_2d --plot --folder out/``.
"""

import numpy as np

from ..geometry.domain import PolygonDomain2D
from ..problems.adpde import ADPDE
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("steady AD on an L-shaped domain", epochs=20000, disc=40)
    p.add_argument("--kappa", type=float, default=0.05)
    p.add_argument("--gaussian-source", action="store_true",
                   help="the round-1 unscored demo config (Gaussian source, "
                        "no exact solution) instead of the default "
                        "manufactured-solution config")
    args = p.parse_args(argv)

    if not args.gaussian_source:
        # Default: manufactured solution -> quantitative rel-L2 acceptance
        # (inner re-entrant edges carry non-trivial per-edge Dirichlet data).
        from ..problems.analytic import lshape_manufactured_2d

        case = lshape_manufactured_2d(kappa=args.kappa)
        return run_case(case["pde"], args, weight=(1.0, 10.0))

    # L-shape: unit square with the top-right quadrant removed.
    domain = PolygonDomain2D(np.array([
        [0.0, 0.0], [1.0, 0.0], [1.0, 0.5], [0.5, 0.5], [0.5, 1.0], [0.0, 1.0],
    ]))

    def source(x):
        x = np.atleast_2d(x)
        return np.exp(
            -((x[:, 0] - 0.25) ** 2 + (x[:, 1] - 0.25) ** 2) / (2 * 0.05**2)
        )

    pde = ADPDE(domain, diff=args.kappa, vel=np.array([1.0, 0.5]),
                source=source, bcs=0.0)
    return run_case(pde, args, weight=(1.0, 10.0))


if __name__ == "__main__":
    main()
