"""A/B probe: Jacobi-preconditioned CG vs plain CG inside refine_lm.

Same Adam warm start, then LM at a FIXED small CG budget with and
without the Hutchinson-Jacobi preconditioner (train/gauss_newton.py).
The question the probe answers: at equal cg_iters, does precond reach a
lower loss/rel-L2 (i.e. can production runs cut cg_iters, the dominant
LM cost)?  Writes benchmarks/results/lm_precond_probe.json.

CPU-sized by default (disc 24, width 20); on TPU pass --disc 48
--width 32 --epochs 8000 for a flagship-shaped measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--tpu" not in sys.argv:
    # CPU by default: this probe often runs CONCURRENTLY with TPU jobs
    # and the one tunnel chip must never see two processes (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import transient_ad_2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=24)
    ap.add_argument("--tdisc", type=int, default=16)
    ap.add_argument("--width", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--lm-steps", type=int, default=8)
    ap.add_argument("--cg-iters", type=int, default=30)
    ap.add_argument("--probes", type=int, default=8)
    ap.add_argument("--k-chunks", type=int, default=1)
    ap.add_argument("--tpu", action="store_true",
                    help="allow the real TPU (default forces CPU)")
    ap.add_argument("--out", type=str,
                    default="benchmarks/results/lm_precond_probe.json")
    ap.add_argument("--resume", action="store_true",
                    help="accepted for run_resumable.sh compatibility; "
                         "the probe is short enough to just restart")
    args = ap.parse_args()

    case = transient_ad_2d()
    runs = {}
    # three arms since round 4 (VERDICT r3 item 9): plain CG, the legacy
    # ELEMENTWISE Hutchinson diagonal (measured to degrade final rel-L2),
    # and the per-LEAF trace reduction that replaces it as the default
    for precond, mode in ((0, "diag"), (args.probes, "diag"),
                          (args.probes, "leaf")):
        vn = VarNet(case["pde"], layer_width=(args.width, args.width),
                    disc_num=args.disc, t_disc_num=args.tdisc, seed=0)
        vn.train(epoch_num=args.epochs, weight=(1.0, 10.0, 10.0),
                 save_freq=args.epochs, verbose=False)
        t0 = time.perf_counter()
        r = vn.refine_lm(
            steps=args.lm_steps, weight=(1.0, 10.0, 10.0),
            cg_iters=args.cg_iters, save_freq=1, verbose=True,
            error_disc=48, k_chunks=args.k_chunks, precond=precond,
            precond_mode=mode,
        )
        wall = time.perf_counter() - t0
        key = f"precond={precond}" + (f"_{mode}" if precond else "")
        runs[key] = {
            "losses": [rec["loss"] for rec in r.losses],
            "rel_l2": r.errors,
            "lm_wall_s": wall,
        }
        print(f"[probe] {key}: final loss "
              f"{r.losses[-1]['loss']:.4e} relL2 {r.errors[-1]:.3e} "
              f"({wall:.1f}s)")

    out = {
        "problem": f"transient_ad_2d disc={args.disc}/tdisc={args.tdisc} "
                   f"width={args.width}",
        "adam_epochs": args.epochs,
        "lm": f"{args.lm_steps} steps cg={args.cg_iters}",
        "platform": jax.devices()[0].platform,
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v["rel_l2"][-1] for k, v in runs.items()}))


if __name__ == "__main__":
    main()
