"""Hyperparameter sweep on the flagship 2-D transient AD config.

Weights are a TRACED argument of the jitted step, so all weight settings
share one compilation; lr/width changes recompile.  Used to pick the
defaults that reach the <1e-3 rel-L2 BASELINE target (SURVEY.md §7 "hard
parts" item 4: loss-weight sensitivity).

Run: python benchmarks/sweep_flagship.py [--epochs 20000]
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
    ap.add_argument("--epochs", type=int, default=20000)
    ap.add_argument("--disc", type=int, default=30)
    ap.add_argument("--tdisc", type=int, default=20)
    ap.add_argument("--width", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay", type=float, default=None)
    ap.add_argument("--weights", type=str,
                    default="1,10,10;1,100,100;10,100,100;1,1000,1000")
    args = ap.parse_args()

    case = transient_ad_2d()
    opt = OptimizerConfig(lr=args.lr, decay_rate=args.decay,
                          decay_steps=max(args.epochs // 5, 1))
    for spec in args.weights.split(";"):
        w = tuple(float(v) for v in spec.split(","))
        vn = VarNet(
            case["pde"], layer_width=(args.width, args.width),
            disc_num=args.disc, b_disc_num=args.disc, t_disc_num=args.tdisc,
            optimizer=opt,
        )
        res = vn.train(
            epoch_num=args.epochs, weight=w,
            save_freq=max(args.epochs // 4, 1), verbose=False,
        )
        print(json.dumps({
            "weights": w, "lr": args.lr, "decay": args.decay,
            "width": args.width,
            "errors": res.errors, "final_loss": res.losses[-1],
            "best": res.best_error(),
        }), flush=True)


if __name__ == "__main__":
    main()
