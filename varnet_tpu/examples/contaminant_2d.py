"""BASELINE config 4: 2-D contaminant transport, spatially varying velocity.

The T-RO cloaking-style case (SURVEY.md §0 item 7): Poiseuille shear flow
in a channel, free outflow boundary.  DEFAULT variant: time-gated Dirichlet
INLET concentration profile — cross-validated against the classical FDM
solver (benchmarks/contaminant_validation.py, rel-L2 in
benchmarks/results/contaminant_validation.json).  ``--volumetric-source``
selects the gated-Gaussian volumetric-source variant, which is a DOCUMENTED
limitation: with homogeneous BC/IC the u=0 quasi-minimum defeats every
tested optimizer/curriculum (DESIGN.md 'zero-data attractor').
Run: ``python -m varnet_tpu.examples.contaminant_2d --plot --folder out/``.
"""

from ..problems.analytic import contaminant_inlet_2d, contaminant_transport_2d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D contaminant transport (shear flow)", epochs=50000,
                    disc=40, tdisc=25, save_freq=5000)
    p.add_argument("--kappa", type=float, default=None)
    p.add_argument("--umax", type=float, default=1.0)
    p.add_argument("--volumetric-source", action="store_true",
                   help="the source-driven variant (see module docstring)")
    args = p.parse_args(argv)
    if args.volumetric_source:
        kap = 0.01 if args.kappa is None else args.kappa
        case = contaminant_transport_2d(kappa=kap, u_max=args.umax)
    else:
        kap = 0.03 if args.kappa is None else args.kappa
        case = contaminant_inlet_2d(kappa=kap, u_max=args.umax)
    return run_case(
        case["pde"], args, weight=(1.0, 10.0, 10.0), t_disc_num=args.tdisc
    )


if __name__ == "__main__":
    main()
