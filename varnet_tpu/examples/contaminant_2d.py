"""BASELINE config 4: 2-D contaminant transport, spatially varying velocity.

The T-RO cloaking-style case (SURVEY.md §0 item 7): Poiseuille shear flow
in a channel, Gaussian source pulse near the inlet, free outflow boundary.
No closed-form solution (the reference validates against COMSOL data not
shipped); loss convergence + plots are the output.
Run: ``python -m varnet_tpu.examples.contaminant_2d --plot --folder out/``.
"""

from ..problems.analytic import contaminant_transport_2d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D contaminant transport (shear flow)", epochs=50000,
                    disc=40, tdisc=25, save_freq=5000)
    p.add_argument("--kappa", type=float, default=0.01)
    p.add_argument("--umax", type=float, default=1.0)
    args = p.parse_args(argv)
    case = contaminant_transport_2d(kappa=args.kappa, u_max=args.umax)
    return run_case(
        case["pde"], args, weight=(1.0, 10.0, 10.0), t_disc_num=args.tdisc
    )


if __name__ == "__main__":
    main()
