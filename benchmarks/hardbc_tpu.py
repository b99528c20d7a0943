"""TPU A/B: exact (hard-constraint) BC imposition vs penalty training.

Honest cases only — each has homogeneous or genuinely-boundary data, so
the data extension G is NOT the solution and the network does all the
work (on analytic cases whose BCs come from c_ex, e.g. the flagship,
hard_bc would encode the exact solution into G — data leakage, measured
and deliberately excluded; see DESIGN.md decision 18).

  2d   : steady_ad_2d — manufactured source, zero Dirichlet (G = 0,
         ansatz u = D net).
  3d   : steady_ad_3d — same structure in 3-D (TPU penalty reference:
         2.24e-3 at disc 12 / width 64, ad3d_floor.json).
  1dt  : transient_ad_1d — erfc front, time-varying compatible BC data.
  3dt  : transient_ad_3d — 4-D space-time test classes, zero Dirichlet
         (G reduces to the IC extension u0(x); the net learns the full
         4-D correction).  Penalty reference: 4.64e-3 at disc 16/tdisc 10
         width 64 after deep LM (ad3d_floor.json).

Usage: python -u benchmarks/hardbc_tpu.py --case 2d --disc 48 ...
Writes benchmarks/results/hardbc_tpu.json (append) and persists the hard
theta when it beats 1e-3.
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
    ap.add_argument("--case", choices=("2d", "3d", "1dt", "3dt"),
                    default="2d")
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=8000)
    ap.add_argument("--lm-steps", type=int, default=30)
    ap.add_argument("--lm-cg", type=int, default=200)
    ap.add_argument("--k-chunks", type=int, default=1)
    ap.add_argument("--modes", type=str, default="hard,penalty")
    ap.add_argument("--order", type=int, default=1, choices=(1, 2),
                    help="test-function order (2 = quadratic classes; "
                         "the hard x order-2 composition is the VERDICT "
                         "r3 item 4 A/B arm for the 2-D steady "
                         "regression)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume Adam/LM from the per-mode case folder "
                         "(hang/timeout recovery under run_resumable.sh)")
    ap.add_argument("--folder", type=str, default="/tmp/hardbc_tpu")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import (
        steady_ad_2d,
        steady_ad_3d,
        transient_ad_1d,
        transient_ad_3d,
    )
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.utils.helpers import enable_compilation_cache
    from varnet_tpu.utils.io import persist_theta_if_better

    enable_compilation_cache()
    factory = {"2d": steady_ad_2d, "3d": steady_ad_3d,
               "1dt": transient_ad_1d, "3dt": transient_ad_3d}[args.case]
    case = factory()
    td = case["pde"].time_dependent
    vn_kw = {"t_disc_num": args.tdisc} if td else {}
    # 3dt: zero Dirichlet everywhere (no leakage); the IC is problem data
    # (same honesty convention as 1dt).  Penalty reference at d16/t10 w64:
    # 4.64e-3 (ad3d_floor.json, deep LM).
    err_disc = {"2d": 96, "3d": 32, "1dt": 256, "3dt": 24}[args.case]

    rows = []
    for mode in args.modes.split(","):
        hard = mode == "hard"
        w = None if hard else ((1.0, 10.0, 10.0) if td else (1.0, 10.0))
        t0 = time.perf_counter()
        vn = VarNet(
            case["pde"], layer_width=(args.width,) * args.layers,
            disc_num=args.disc, b_disc_num=max(args.disc, 24), n_devices=1,
            hard_bc=hard, test_order=args.order,
            **({"integ_p_num": 3} if args.order == 2 else {}),
            optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.1,
                                      decay_steps=max(args.epochs // 4, 1)),
            **vn_kw,
        )
        res = vn.train(epoch_num=args.epochs, weight=w,
                       save_freq=max(args.epochs // 6, 1), verbose=True,
                       error_disc=err_disc, error_times=5,
                       matmul_precision="highest",
                       folderpath=f"{args.folder}_{args.case}_{mode}_o{args.order}",
                       resume=args.resume, max_retries=2)
        r = vn.refine_lm(steps=args.lm_steps, weight=w,
                         cg_iters=args.lm_cg,
                         save_freq=max(args.lm_steps // 6, 1), verbose=True,
                         error_disc=err_disc, error_times=5,
                         k_chunks=args.k_chunks, matmul_precision="highest",
                         folderpath=f"{args.folder}_{args.case}_{mode}_o{args.order}",
                         resume=args.resume, max_retries=2)
        finite = ([e for e in res.errors if e == e]
                  + [e for e in r.errors if e == e])
        rescored = None
        if not finite:
            # a --resume re-run whose Adam AND LM budgets were already
            # complete no-ops with empty histories; the restored theta IS
            # the run's final iterate — score it instead of losing the
            # A/B number the benchmark exists to produce
            ce = vn.compute_error(vn.theta, disc=err_disc, n_times=5)
            rescored = None if ce is None else float(ce)
            finite = [] if rescored is None else [rescored]
        # None (JSON null), not float("nan"): NaN serializes as an invalid
        # bare literal that breaks the next json.loads of the results file.
        best = min((e for e in finite if e == e), default=None)
        row = {
            "case": args.case,
            "mode": mode,
            "mesh": (f"disc={args.disc}" + (f" tdisc={args.tdisc}" if td
                                            else "")),
            "network": f"({args.width},)x{args.layers}",
            "epochs": args.epochs,
            "order": args.order,
            "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
            "platform": jax.devices()[0].platform,
            "best_rel_l2": best,
            "adam_rel_l2": min((e for e in res.errors if e == e),
                               default=None),
            "wall_s": time.perf_counter() - t0,
        }
        rows.append(row)
        # write per MODE, not after the whole loop: a timeout during the
        # second mode must not lose the first mode's completed A/B number
        RESULTS.mkdir(exist_ok=True)
        path = RESULTS / "hardbc_tpu.json"
        data = json.loads(path.read_text()) if path.exists() else []
        data.append(row)
        path.write_text(json.dumps(data, indent=2))
        print(json.dumps(row, indent=2), flush=True)
        final = next((e for e in reversed(r.errors) if e == e),
                     float("nan") if rescored is None else rescored)
        if hard and final == final and final < 1e-3:
            # gate on the FINAL error: vn.theta is the final iterate, and
            # pins re-score persisted thetas (history bests may not
            # re-score — repo invariant)
            persist_theta_if_better(
                RESULTS / f"theta_hardbc_{args.case}.npz", vn.theta, final)

if __name__ == "__main__":
    main()
