"""3-D steady AD on the unit cube (beyond-reference: the reference stops
at 2-D — SURVEY.md §2.1 #4; here 3-D costs only the box domain because
every layer above geometry is dimension-generic).

Manufactured solution u = sin(pi x) sin(pi y) sin(pi z).
Run: ``python -m varnet_tpu.examples.ad3d_steady``.
"""

from ..problems.analytic import steady_ad_3d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("3D steady AD (manufactured)", epochs=20000, disc=12)
    p.add_argument("--kappa", type=float, default=0.1)
    args = p.parse_args(argv)
    case = steady_ad_3d(kappa=args.kappa)
    return run_case(case["pde"], args, weight=(1.0, 10.0))


if __name__ == "__main__":
    main()
