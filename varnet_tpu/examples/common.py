"""Shared CLI runner for the example cases.

The reference ships repo-root driver scripts that are edited by hand
(SURVEY.md §2.1 #8 / §5.6: "no argparse/YAML — scripts are edited");
here each example is a thin config-driven entry point:

    python -m varnet_tpu.examples.ad1d_steady --epochs 20000 --folder out/

All five BASELINE.json configs follow this shape.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..api import VarNet
from ..train.optim import OptimizerConfig


def make_parser(desc: str, **defaults) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--epochs", type=int, default=defaults.get("epochs", 20000))
    p.add_argument("--disc", type=int, default=defaults.get("disc", 30))
    p.add_argument("--tdisc", type=int, default=defaults.get("tdisc", 20))
    p.add_argument("--bdisc", type=int, default=defaults.get("bdisc", 20))
    p.add_argument("--width", type=int, default=defaults.get("width", 20))
    p.add_argument("--layers", type=int, default=defaults.get("layers", 2))
    p.add_argument("--lr", type=float, default=defaults.get("lr", 1e-3))
    p.add_argument("--decay", type=float, default=defaults.get("decay", 0.4),
                   help="exponential lr decay factor (deep decay schedules "
                        "drive the final error decade; 0 disables)")
    p.add_argument("--decay-every", type=int, default=None,
                   help="decay period in epochs (default: epochs // 6)")
    p.add_argument("--precision", type=str,
                   default=defaults.get("precision", None),
                   help="matmul precision ('highest' for <1e-3 targets)")
    p.add_argument("--lm-steps", type=int, default=0,
                   help="Levenberg-Marquardt polish iterations after Adam "
                        "(the final-decade tool; see BASELINE.md)")
    p.add_argument("--lm-cg", type=int, default=50)
    p.add_argument("--lm-precond", type=int, default=0,
                   help="Jacobi-PCG probes inside LM (0 = plain CG; see "
                        "DESIGN.md decision 13)")
    p.add_argument("--ensemble", type=int, default=0,
                   help="train E independently-seeded nets in one vmapped "
                        "step and keep the best (beyond-reference; "
                        "DESIGN.md decision 14)")
    p.add_argument("--batch-num", type=int, default=1)
    p.add_argument("--save-freq", type=int, default=defaults.get("save_freq", 2000))
    p.add_argument("--folder", type=str, default=None,
                   help="case folder for checkpoints/logs/plots")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--target", type=float, default=None,
                   help="early-stop rel-L2 error target")
    p.add_argument("--plot", action="store_true", help="render sim_res plots")
    p.add_argument("--test-order", type=int, default=1, choices=(1, 2),
                   help="test-function order: 1 = hats (reference), 2 = "
                        "quadratic Lagrange (O(h^3) floor, beyond-reference)")
    p.add_argument("--hard-bc", action="store_true",
                   help="EXACT Dirichlet-BC/IC imposition (u = G + tau D "
                        "net; BC/IC penalty rows drop out — "
                        "beyond-reference, DESIGN.md decision 18)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=None)
    return p


def run_case(pde, args, weight, t_disc_num=None, **varnet_kwargs) -> VarNet:
    from ..utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    decay = getattr(args, "decay", 0.0) or None
    decay_every = getattr(args, "decay_every", None) or max(args.epochs // 6, 1)
    vn = VarNet(
        pde,
        layer_width=(args.width,) * args.layers,
        disc_num=args.disc,
        b_disc_num=args.bdisc,
        t_disc_num=t_disc_num,
        test_order=args.test_order,
        seed=args.seed,
        n_devices=args.devices,
        optimizer=OptimizerConfig(
            lr=args.lr, decay_rate=decay, decay_steps=decay_every
        ),
        hard_bc=getattr(args, "hard_bc", False),
        **varnet_kwargs,
    )
    n_ens = getattr(args, "ensemble", 0)
    if n_ens >= 2:
        if args.resume:
            raise SystemExit("--ensemble does not support --resume "
                             "(members re-initialize per run)")
        res_e = vn.train_ensemble(
            epoch_num=args.epochs,
            n_members=n_ens,
            weight=weight,
            batch_num=args.batch_num,
            save_freq=args.save_freq,
            matmul_precision=getattr(args, "precision", None),
        )
        summary = {
            "best_rel_l2": res_e.best_error,
            "best_member": res_e.best_member,
            "member_rel_l2": res_e.member_errors[-1],
            "final_loss": min(res_e.member_losses[-1]),
            "quad_evals_per_sec": res_e.quad_evals_per_sec,
            "steps_per_sec": res_e.steps_per_sec,
        }
    else:
        res = vn.train(
            epoch_num=args.epochs,
            weight=weight,
            batch_num=args.batch_num,
            save_freq=args.save_freq,
            folderpath=args.folder,
            resume=args.resume,
            target_error=args.target,
            matmul_precision=getattr(args, "precision", None),
        )
        summary = {
            "best_rel_l2": res.best_error(),
            "final_loss": res.losses[-1]["loss"] if res.losses else None,
            "quad_evals_per_sec": res.quad_evals_per_sec,
            "steps_per_sec": res.steps_per_sec,
        }
    if getattr(args, "lm_steps", 0):
        r_lm = vn.refine_lm(
            steps=args.lm_steps, weight=weight, cg_iters=args.lm_cg,
            save_freq=max(args.lm_steps // 10, 1), target_error=args.target,
            matmul_precision=getattr(args, "precision", None) or "highest",
            precond=getattr(args, "lm_precond", 0),
        )
        summary["lm_best_rel_l2"] = r_lm.best_error()
    print(json.dumps(summary))
    if args.plot and args.folder:
        vn.sim_res(args.folder)
    return vn
