"""BASELINE config 4: 2-D contaminant transport, spatially varying velocity.

The T-RO cloaking-style case (SURVEY.md §0 item 7): Poiseuille shear flow
in a channel, free outflow boundary.  DEFAULT variant: time-gated Dirichlet
INLET concentration profile — cross-validated against the classical FDM
solver (benchmarks/contaminant_validation.py, rel-L2 in
benchmarks/results/contaminant_validation.json).  ``--volumetric-source``
selects the gated-Gaussian volumetric-source variant, whose homogeneous
BC/IC put full-window training in the u=0 zero-data attractor
(DESIGN.md); pair it with ``--causal N`` (growing-time-window curriculum,
train/causal.py) and ``--ff``/``--ff-scale`` (multi-scale Fourier basis)
— the measured escape recipe (benchmarks/contaminant_causal.py).
Run: ``python -m varnet_tpu.examples.contaminant_2d --plot --folder out/``.
"""

import json

from ..problems.analytic import contaminant_inlet_2d, contaminant_transport_2d
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D contaminant transport (shear flow)", epochs=50000,
                    disc=40, tdisc=25, save_freq=5000)
    p.add_argument("--kappa", type=float, default=None)
    p.add_argument("--umax", type=float, default=1.0)
    p.add_argument("--volumetric-source", action="store_true",
                   help="the source-driven variant (see module docstring)")
    p.add_argument("--causal", type=int, default=0, metavar="N",
                   help="train through N growing time windows (volumetric-"
                        "source variant; escapes the u=0 attractor)")
    p.add_argument("--ff", type=int, default=0,
                   help="random Fourier features (0 = plain MLP)")
    p.add_argument("--ff-scale", type=str, default="0.5,2.0",
                   help="FF scale, or comma-list for a multi-scale basis")
    args = p.parse_args(argv)
    if args.causal and not args.volumetric_source:
        p.error("--causal applies to the --volumetric-source variant "
                "(the inlet variant trains full-window without it)")
    extra = {}
    if args.ff:
        scales = [float(s) for s in str(args.ff_scale).split(",")]
        extra = dict(fourier_features=args.ff,
                     fourier_scale=scales[0] if len(scales) == 1 else scales)
    if args.volumetric_source:
        kap = 0.01 if args.kappa is None else args.kappa
        if args.causal:
            return _run_causal(args, kap, extra)
        case = contaminant_transport_2d(kappa=kap, u_max=args.umax)
    else:
        kap = 0.03 if args.kappa is None else args.kappa
        case = contaminant_inlet_2d(kappa=kap, u_max=args.umax)
    return run_case(
        case["pde"], args, weight=(1.0, 10.0, 10.0), t_disc_num=args.tdisc,
        **extra,
    )


def _run_causal(args, kap, extra):
    from ..train.causal import train_causal
    from ..train.optim import OptimizerConfig
    from ..utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    w = (1.0, 10.0, 10.0)
    vn, stages = train_causal(
        lambda t_end: contaminant_transport_2d(
            kappa=kap, u_max=args.umax, t_final=t_end)["pde"],
        windows=[(i + 1) / args.causal for i in range(args.causal)],
        epoch_num=args.epochs, weight=w, t_disc_full=args.tdisc,
        varnet_kwargs=dict(
            layer_width=(args.width,) * args.layers, disc_num=args.disc,
            b_disc_num=args.bdisc, seed=args.seed, n_devices=args.devices,
            optimizer=OptimizerConfig(
                lr=args.lr, decay_rate=args.decay or None,
                decay_steps=args.decay_every or max(args.epochs // 6, 1)),
            **extra),
        train_kwargs=dict(batch_num=args.batch_num,
                          save_freq=args.save_freq,
                          matmul_precision=args.precision),
        folderpath=args.folder,
        resume=args.resume,
    )
    summary = {"stage_losses": [s.get("final_loss") for s in stages]}
    if args.lm_steps:
        r_lm = vn.refine_lm(
            steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
            save_freq=max(args.lm_steps // 10, 1),
            matmul_precision=args.precision or "highest",
            folderpath=args.folder,
        )
        if r_lm.losses:  # empty when a resumed LM budget was already met
            summary["lm_final_loss"] = r_lm.losses[-1]["loss"]
    print(json.dumps(summary))
    if args.plot and args.folder:
        vn.sim_res(args.folder)
    return vn


if __name__ == "__main__":
    main()
