"""Long-budget accuracy run on the flagship 2-D transient AD problem.

Progressive mesh refinement: train on a coarse quadrature mesh first
(cheap epochs, gets the solution shape), then continue on the fine mesh
(lowers the O(h^2) discretization floor toward the <1e-3 BASELINE target).
Parameters transfer directly because u_theta(x, t) is mesh-independent —
a capability the reference's fixed-graph TF1 design could not express.

Run: python benchmarks/accuracy_flagship.py --folder /tmp/acc
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402
from varnet_tpu.train.optim import OptimizerConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", type=str, default="/tmp/acc_flagship")
    ap.add_argument("--width", type=int, default=24)
    ap.add_argument("--coarse-epochs", type=int, default=60000)
    ap.add_argument("--fine-epochs", type=int, default=40000)
    ap.add_argument("--coarse-disc", type=int, default=30)
    ap.add_argument("--coarse-tdisc", type=int, default=20)
    ap.add_argument("--fine-disc", type=int, default=48)
    ap.add_argument("--fine-tdisc", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--target", type=float, default=8e-4)
    ap.add_argument("--precision", type=str, default=None,
                    help="matmul precision, e.g. 'highest'")
    args = ap.parse_args()

    case = transient_ad_2d()
    w = (1.0, 10.0, 10.0)

    def build(disc, tdisc, lr, decay_steps):
        return VarNet(
            case["pde"], layer_width=(args.width, args.width),
            disc_num=disc, b_disc_num=disc, t_disc_num=tdisc,
            optimizer=OptimizerConfig(
                lr=lr, decay_rate=0.5, decay_steps=decay_steps
            ),
        )

    # Stage 1: coarse
    vn = build(args.coarse_disc, args.coarse_tdisc, args.lr,
               max(args.coarse_epochs // 4, 1))
    r1 = vn.train(
        epoch_num=args.coarse_epochs, weight=w, save_freq=10000,
        folderpath=args.folder, target_error=args.target,
        error_disc=96, error_times=7, matmul_precision=args.precision,
    )
    print(json.dumps({"stage": "coarse", "best": r1.best_error(),
                      "errors": r1.errors}), flush=True)

    # Stage 2: fine mesh, warm-started from stage 1
    vn2 = build(args.fine_disc, args.fine_tdisc, args.lr / 4,
                max(args.fine_epochs // 4, 1))
    vn2.load_model(args.folder)
    r2 = vn2.train(
        epoch_num=args.fine_epochs, weight=w, save_freq=5000,
        folderpath=args.folder + "_fine", target_error=args.target,
        error_disc=96, error_times=7, matmul_precision=args.precision,
    )
    print(json.dumps({"stage": "fine", "best": r2.best_error(),
                      "errors": r2.errors}), flush=True)


if __name__ == "__main__":
    main()
