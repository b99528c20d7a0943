"""Accuracy of the viscous-Burgers family (beyond-reference nonlinear
advection, DESIGN.md decision 16): Adam + LM on the 1-D tanh traveling
front (default) or the steady standing shock (--steady), appending
rel-L2 rows to benchmarks/results/burgers_accuracy.json and persisting
theta for pinning when the north-star 1e-3 criterion is met.

Run (TPU):  python -u benchmarks/burgers_accuracy.py
            python -u benchmarks/burgers_accuracy.py --steady
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).parent / "results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steady", action="store_true")
    ap.add_argument("--two-d", action="store_true",
                    help="2-D planar traveling front (true analytic "
                         "nonlinear solution) instead of 1-D")
    ap.add_argument("--nu", type=float, default=0.05)
    ap.add_argument("--amp", type=float, default=0.4)
    ap.add_argument("--speed", type=float, default=0.6)
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=12000)
    ap.add_argument("--lm-steps", type=int, default=40)
    ap.add_argument("--lm-cg", type=int, default=200)
    ap.add_argument("--k-chunks", type=int, default=1)
    ap.add_argument("--hard-bc", action="store_true",
                    help="exact Dirichlet BC/IC imposition (composes with "
                         "nl_adv, DESIGN.md 16+18); persists under a _hard "
                         "theta stem so penalty pins stay untouched")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--folder", type=str, default="/tmp/burgers_acc")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import (
        burgers_1d_steady,
        burgers_1d_transient,
        burgers_2d_front,
    )
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.utils.helpers import enable_compilation_cache
    from varnet_tpu.utils.io import persist_theta_if_better

    enable_compilation_cache()
    if args.two_d:
        case = burgers_2d_front(nu=args.nu)
        w = (1.0, 10.0, 10.0)
        vn_kw = {"t_disc_num": args.tdisc}
    elif args.steady:
        case = burgers_1d_steady(nu=args.nu, a=max(args.amp, 1.0))
        w = (1.0, 10.0)
        vn_kw = {}
    else:
        case = burgers_1d_transient(nu=args.nu, a=args.amp, c=args.speed)
        w = (1.0, 10.0, 10.0)
        vn_kw = {"t_disc_num": args.tdisc}
    t0 = time.perf_counter()
    if args.hard_bc:
        w = None  # BC/IC rows are exact by ansatz; unit interior weight
    vn = VarNet(
        case["pde"], layer_width=(args.width,) * args.layers,
        disc_num=args.disc, b_disc_num=max(args.disc, 24), n_devices=1,
        hard_bc=args.hard_bc,
        optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.1,
                                  decay_steps=max(args.epochs // 4, 1)),
        **vn_kw,
    )
    err_disc = 96 if args.two_d else 256
    res = vn.train(epoch_num=args.epochs, weight=w,
                   save_freq=max(args.epochs // 6, 1), verbose=True,
                   error_disc=err_disc, matmul_precision="highest",
                   folderpath=args.folder, resume=args.resume,
                   max_retries=2)
    r = vn.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                     save_freq=max(args.lm_steps // 8, 1), verbose=True,
                     error_disc=err_disc, k_chunks=args.k_chunks,
                     matmul_precision="highest", folderpath=args.folder,
                     resume=args.resume, max_retries=2)
    finite = ([e for e in res.errors if e == e]
              + [e for e in r.errors if e == e])
    # None (JSON null), not float("nan"): NaN serializes as an invalid
    # bare literal that breaks the next json.loads of the results file.
    best = min(finite, default=None)
    row = {
        "case": ("front_2d" if args.two_d
                 else "steady_shock" if args.steady else "traveling_front"),
        "mode": "hard" if args.hard_bc else "penalty",
        "nu": args.nu,
        "mesh": (f"disc={args.disc}" if args.steady and not args.two_d
                 else f"disc={args.disc} tdisc={args.tdisc}"),
        "network": f"({args.width},)x{args.layers}",
        "epochs": args.epochs,
        "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
        "platform": jax.devices()[0].platform,
        "best_rel_l2": best,
        "adam_rel_l2": min((e for e in res.errors if e == e),
                           default=None),
        "wall_s": time.perf_counter() - t0,
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "burgers_accuracy.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)
    # persist the FINAL iterate's score (what the file re-scores to in
    # the pin test), improve-only via the sidecar guard
    final = next((e for e in reversed(r.errors) if e == e),
                 next((e for e in reversed(res.errors) if e == e),
                      float("nan")))
    if final == final and final < 1e-3:
        stem = row["case"] + ("_hard" if args.hard_bc else "")
        persist_theta_if_better(RESULTS / f"theta_burgers_{stem}.npz",
                                vn.theta, final)


if __name__ == "__main__":
    main()
