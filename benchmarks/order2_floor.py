"""Order-2 test-space floor study on the flagship 2-Dt AD-PDE (TPU).

The 1-D measurement (tests/test_quadratic.py, DESIGN.md decision 9)
showed an 8x floor drop at fixed disc.  This script measures the same
effect on the flagship family: rel-L2 after Adam + LM at matched meshes
for test_order 1 vs 2, appending rows to
benchmarks/results/order2_floor.json and persisting any theta that beats
the current flagship best.

Run (TPU):
  python -u benchmarks/order2_floor.py --order 2 --disc 16 --tdisc 12
  python -u benchmarks/order2_floor.py --order 1 --disc 16 --tdisc 12
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402
from varnet_tpu.train.optim import OptimizerConfig  # noqa: E402
from varnet_tpu.utils.io import save_theta_npz  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=2, choices=(1, 2))
    ap.add_argument("--disc", type=int, default=16)
    ap.add_argument("--tdisc", type=int, default=12)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=12000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lm-steps", type=int, default=30)
    ap.add_argument("--lm-cg", type=int, default=200)
    ap.add_argument("--k-chunks", type=int, default=1)
    ap.add_argument("--integ", type=int, default=3,
                    help="Gauss points per dim per element/piece")
    ap.add_argument("--folder", type=str, default="/tmp/order2_floor")
    ap.add_argument("--precoeff", action="store_true",
                    help="explicitly opt into the precomputed-coefficient "
                         "fused residual kernel (order 2 now AUTO-selects "
                         "it — this flag only matters for --order 1 A/Bs; "
                         "LM always uses the value+jac kernel pair)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest checkpoints in --folder "
                         "(run_resumable.sh adds this on attempts 2+)")
    args = ap.parse_args()

    case = transient_ad_2d()
    w = (1.0, 10.0, 10.0)
    t0 = time.perf_counter()
    vn = VarNet(
        case["pde"], layer_width=(args.width,) * args.layers,
        disc_num=args.disc, b_disc_num=max(args.disc, 24),
        t_disc_num=args.tdisc, test_order=args.order,
        integ_p_num=args.integ, fused_precoeff=args.precoeff,
        optimizer=OptimizerConfig(lr=args.lr, decay_rate=0.1,
                                  decay_steps=max(args.epochs // 4, 1)),
    )
    res = vn.train(
        epoch_num=args.epochs, weight=w, save_freq=max(args.epochs // 6, 1),
        verbose=True, error_disc=96, error_times=7,
        matmul_precision="highest", folderpath=args.folder, max_retries=2,
        resume=args.resume,
    )
    r = vn.refine_lm(
        steps=args.lm_steps, weight=w, cg_iters=args.lm_cg, cg_segment=40,
        save_freq=1, error_disc=96, error_times=7, k_chunks=args.k_chunks,
        matmul_precision="highest", verbose=True, folderpath=args.folder,
        max_retries=2, resume=args.resume,
    )
    finite = ([e for e in res.errors if e == e]
              + [e for e in r.errors if e == e])
    if not finite:
        # a --resume re-run whose Adam AND LM budgets were already complete
        # no-ops with empty histories; score the restored final iterate
        # instead of crashing on min() of an empty sequence
        finite = [float(vn.compute_error(vn.theta, disc=96, n_times=7))]
    best = min(finite)
    row = {
        "order": args.order,
        "mesh": f"disc={args.disc} tdisc={args.tdisc} integ={args.integ}",
        "n_test": vn.static.n_test,
        "n_quad_per_test": vn.static.n_quad_per_test,
        "network": f"({args.width},)x{args.layers}",
        "epochs": args.epochs,
        "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
        "best_rel_l2": best,
        "adam_rel_l2": min((e for e in res.errors if e == e), default=None),
        "adam_quad_evals_per_sec": res.quad_evals_per_sec,
        "precoeff": args.precoeff,
        "wall_s": time.perf_counter() - t0,
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "order2_floor.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)
    if best < 1.1e-4:  # beats the pinned flagship best (1.195e-4)
        save_theta_npz(
            RESULTS / f"flagship_theta_o{args.order}_{best:.1e}.npz",
            vn.theta)
        print(f"[order2_floor] theta persisted ({best:.3e})", flush=True)


if __name__ == "__main__":
    main()
