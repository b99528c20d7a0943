"""Flagship accuracy pipeline: Adam (coarse) -> Adam (fine) -> LM.

The recipe that REACHED the <1e-3 rel-L2 BASELINE target (8.31e-4
measured on TPU v5e — benchmarks/results/flagship_accuracy.json):

1. Adam on a coarse quadrature mesh with a DEEP exponential lr decay —
   cheap epochs find the basin; exact-f32 matmuls throughout.
2. Adam on the fine mesh, warm-started — lowers the O(h^2) test-function
   spacing bias.  (u_theta is mesh-independent, so parameters transfer
   directly; the reference's fixed TF1 graph could not express this.)
3. Levenberg-Marquardt (matrix-free Gauss-Newton + deep segmented CG) —
   owns the final error decade where first-order methods crawl.

Run: python benchmarks/accuracy_flagship.py --folder /tmp/acc

With --persist, the final theta lands in benchmarks/results/
flagship_theta_w{width}x{layers}.npz and a summary row is appended to
flagship_width.json — the capacity study attacking the width-48 LM
plateau (1.081e-4 oscillating over 16 disc-64 iters, flagship_push.json:
is the floor representation- or mesh-bound?).  --resume makes every
stage restartable (run_resumable.sh protocol).
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
from varnet_tpu.utils.io import persist_theta_if_better  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", type=str, default="/tmp/acc_flagship")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--coarse-epochs", type=int, default=50000)
    ap.add_argument("--fine-epochs", type=int, default=25000)
    ap.add_argument("--lm-steps", type=int, default=15)
    ap.add_argument("--cg-iters", type=int, default=200)
    ap.add_argument("--coarse-disc", type=int, default=30)
    ap.add_argument("--coarse-tdisc", type=int, default=20)
    ap.add_argument("--fine-disc", type=int, default=48)
    ap.add_argument("--fine-tdisc", type=int, default=32)
    ap.add_argument("--k-chunks", type=int, default=16,
                    help="LM-stage quad-point chunking (VMEM/HBM bound)")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--target", type=float, default=8e-4)
    ap.add_argument("--precision", type=str, default="highest")
    ap.add_argument("--max-retries", type=int, default=2,
                    help="auto-resume count on transient device faults")
    ap.add_argument("--resume", action="store_true",
                    help="restart each stage from its checkpoint folder")
    ap.add_argument("--persist", action="store_true",
                    help="save the final theta under benchmarks/results/ "
                         "and append a row to flagship_width.json")
    args = ap.parse_args()

    t0 = time.perf_counter()
    case = transient_ad_2d()
    w = (1.0, 10.0, 10.0)
    widths = (args.width,) * args.layers

    def build(disc, tdisc, lr, decay_steps):
        return VarNet(
            case["pde"], layer_width=widths,
            disc_num=disc, b_disc_num=disc, t_disc_num=tdisc,
            optimizer=OptimizerConfig(
                lr=lr, decay_rate=0.5, decay_steps=decay_steps
            ),
        )

    # Stage 1: Adam, coarse mesh
    vn = build(args.coarse_disc, args.coarse_tdisc, args.lr,
               max(args.coarse_epochs // 4, 1))
    r1 = vn.train(
        epoch_num=args.coarse_epochs, weight=w, save_freq=10000,
        folderpath=args.folder, error_disc=96, error_times=7,
        matmul_precision=args.precision, resume=args.resume,
        max_retries=args.max_retries,
    )
    print(json.dumps({"stage": "coarse", "best": r1.best_error(),
                      "errors": r1.errors}), flush=True)

    # Stage 2: Adam, fine mesh, warm-started
    vn2 = build(args.fine_disc, args.fine_tdisc, args.lr / 4,
                max(args.fine_epochs // 4, 1))
    fine_folder = args.folder + "_fine"
    resume_fine = args.resume and Path(fine_folder).exists()
    if not resume_fine:
        vn2.load_model(args.folder)
    r2 = vn2.train(
        epoch_num=args.fine_epochs, weight=w, save_freq=5000,
        folderpath=fine_folder, error_disc=96, error_times=7,
        matmul_precision=args.precision, resume=resume_fine,
        max_retries=args.max_retries,
    )
    print(json.dumps({"stage": "fine", "best": r2.best_error(),
                      "errors": r2.errors}), flush=True)

    # Stage 3: Levenberg-Marquardt polish on the fine mesh
    r3 = vn2.refine_lm(
        steps=args.lm_steps, weight=w, save_freq=1,
        cg_iters=args.cg_iters, cg_segment=40, k_chunks=args.k_chunks,
        error_disc=96, error_times=7, target_error=args.target,
        matmul_precision=args.precision,
        folderpath=args.folder + "_lm", resume=args.resume,
        max_retries=args.max_retries,
    )
    print(json.dumps({"stage": "lm", "best": r3.best_error(),
                      "errors": r3.errors}), flush=True)

    if args.persist:
        bests = [r.best_error() for r in (r1, r2, r3) if r.errors]
        best = min(bests) if bests else float(
            vn2.compute_error(vn2.theta, disc=96, n_times=7))
        RESULTS.mkdir(exist_ok=True)
        stem = f"flagship_theta_w{args.width}x{args.layers}"
        final_err = float(vn2.compute_error(vn2.theta, disc=96, n_times=7))
        persist_theta_if_better(RESULTS / f"{stem}.npz", vn2.theta,
                                final_err)
        row = {
            "width": args.width, "layers": args.layers,
            "coarse": f"disc={args.coarse_disc}/t{args.coarse_tdisc} "
                      f"{args.coarse_epochs}ep",
            "fine": f"disc={args.fine_disc}/t{args.fine_tdisc} "
                    f"{args.fine_epochs}ep",
            "lm": f"{args.lm_steps} iters cg={args.cg_iters}",
            "stage_bests": {"coarse": r1.best_error(),
                            "fine": r2.best_error(),
                            "lm": r3.best_error()},
            "best_rel_l2": best,
            "theta": f"{stem}.npz",
            "wall_s": time.perf_counter() - t0,
        }
        path = RESULTS / "flagship_width.json"
        rows = json.loads(path.read_text()) if path.exists() else []
        rows.append(row)
        path.write_text(json.dumps(rows, indent=2))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
