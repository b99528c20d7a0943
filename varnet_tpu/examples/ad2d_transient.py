"""Flagship: 2-D transient AD with analytic solution (benchmark problem).

The translating-decaying sine solution — the configuration bench.py times
and the BASELINE.json north-star accuracy target (<1e-3 rel-L2).
Run: ``python -m varnet_tpu.examples.ad2d_transient``.
"""

from ..problems.analytic import transient_ad_2d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D transient AD (analytic, flagship)", epochs=50000,
                    disc=30, tdisc=20, save_freq=5000)
    p.add_argument("--kappa", type=float, default=0.05)
    args = p.parse_args(argv)
    case = transient_ad_2d(kappa=args.kappa)
    return run_case(
        case["pde"], args, weight=(1.0, 10.0, 10.0), t_disc_num=args.tdisc
    )


if __name__ == "__main__":
    main()
