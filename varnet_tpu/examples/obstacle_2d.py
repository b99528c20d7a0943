"""Steady AD around a square obstacle (manufactured solution) — polygon
HOLES geometry (beyond-reference: internal obstacle boundaries, the
reference papers' cloaking/obstacle application family; DESIGN.md
decision 20).

The obstacle boundary (segments 4-7) carries the non-trivial Dirichlet
data that drives the solution; ``--hard-bc`` imposes it exactly via
trimmed segment ADFs.  For the transient heated-rod cross-validation
against the CN-FDM solver, see benchmarks/obstacle_validation.py.
Run: ``python -m varnet_tpu.examples.obstacle_2d``.
"""

from ..problems.analytic import obstacle_manufactured_2d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D steady AD around a square obstacle (manufactured)",
                    epochs=20000, disc=24)
    p.add_argument("--kappa", type=float, default=0.05)
    args = p.parse_args(argv)
    case = obstacle_manufactured_2d(kappa=args.kappa)
    return run_case(case["pde"], args, weight=(1.0, 10.0))


if __name__ == "__main__":
    main()
