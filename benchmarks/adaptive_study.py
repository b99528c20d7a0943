"""Adaptive test-space refinement study (fem/adaptive.py).

Question: on an under-resolved sharp feature, does residual-driven
h-adaptivity (VarNet.refine_tests) reach a better rel-L2 than spending
the same test-function budget uniformly?

Protocol (per case):
  1. UNIFORM arm: disc chosen so its n_test ~= the adaptive arm's FINAL
     n_test; train the full epoch budget (+ optional LM polish).
  2. ADAPTIVE arm: start at the coarse disc, train 1/(rounds+1) of the
     budget, refine (frac), repeat; same LM polish at the end.
Both arms report rel-L2 vs the analytic solution, final n_test and wall.

CPU-runnable (1-D) and TPU-ready (2-D, --case ad2d).  Writes one JSON to
benchmarks/results/adaptive_study.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_arm(case, disc, width, layers, epochs, lm_steps, lm_cg, seed,
            adapt_rounds=0, adapt_frac=0.3, weight=(1.0, 10.0),
            t_disc=None, lr=2e-3, warmup=None):
    from varnet_tpu.api import VarNet
    from varnet_tpu.train.optim import OptimizerConfig

    t0 = time.time()
    vn = VarNet(
        case["pde"], layer_width=(width,) * layers, disc_num=disc,
        t_disc_num=t_disc, optimizer=OptimizerConfig(lr=lr), seed=seed,
    )
    stages = adapt_rounds + 1
    if warmup is None or stages == 1:
        budgets = [max(1, epochs // stages)] * stages
    else:
        # warmup-heavy split: the measured failure mode of even splits is
        # a weak stage-0 basin that later stages can't escape
        w0 = max(1, int(epochs * float(warmup)))
        rest = max(1, (epochs - w0) // max(1, stages - 1))
        budgets = [w0] + [rest] * (stages - 1)
    history = []
    for s in range(stages):
        per = budgets[s]
        vn.train(epoch_num=per, weight=weight, save_freq=per, verbose=False)
        err = vn.compute_error(vn.theta)
        history.append({"stage": s, "n_test": int(vn.static.n_test),
                        "rel_l2": float(err)})
        if s < stages - 1:
            info = vn.refine_tests(frac=adapt_frac, verbose=False)
            history[-1]["added"] = info["n_added"]
    if lm_steps:
        res = vn.refine_lm(steps=lm_steps, cg_iters=lm_cg, weight=weight,
                           save_freq=max(1, lm_steps // 4), verbose=False)
        err = min(
            [e for e in res.errors if np.isfinite(e)] + [history[-1]["rel_l2"]]
        )
    else:
        err = history[-1]["rel_l2"]
    return {
        "rel_l2": float(err),
        "n_test_final": int(vn.static.n_test),
        "wall_s": time.time() - t0,
        "history": history,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="ad1d_layer",
                   choices=["ad1d_layer", "ad2d", "ad1dt"])
    p.add_argument("--kappa", type=float, default=0.02)
    p.add_argument("--coarse-disc", type=int, default=8)
    p.add_argument("--uniform-disc", type=int, default=None,
                   help="default: matched to the adaptive arm's final n_test")
    p.add_argument("--width", type=int, default=20)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--epochs", type=int, default=12000)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--frac", type=float, default=0.3)
    p.add_argument("--lm-steps", type=int, default=20)
    p.add_argument("--lm-cg", type=int, default=100)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--t-disc", type=int, default=None)
    p.add_argument("--warmup", type=float, default=None,
                   help="fraction of the epoch budget for the adaptive "
                        "arm's stage 0 (default: even split)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (in-process, beats the "
                        "axon sitecustomize)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.problems import analytic

    if args.case == "ad1d_layer":
        case = analytic.steady_ad_1d(kappa=args.kappa)
        t_disc = None
    elif args.case == "ad1dt":
        case = analytic.transient_ad_1d(kappa=args.kappa)
        t_disc = args.t_disc or 10
    else:
        case = analytic.steady_ad_2d(kappa=args.kappa)
        t_disc = None

    common = dict(width=args.width, layers=args.layers, epochs=args.epochs,
                  lm_steps=args.lm_steps, lm_cg=args.lm_cg, seed=args.seed,
                  t_disc=t_disc)

    adaptive = run_arm(case, args.coarse_disc, adapt_rounds=args.rounds,
                       adapt_frac=args.frac, warmup=args.warmup, **common)
    print(f"[adaptive] rel-L2 {adaptive['rel_l2']:.3e} "
          f"n_test {adaptive['n_test_final']} "
          f"wall {adaptive['wall_s']:.0f}s")

    if args.uniform_disc is None:
        # match the uniform grid's test count to the adaptive arm's final
        d = 1 if args.case.startswith("ad1d") else 2
        n = adaptive["n_test_final"]
        if t_disc is not None:
            n = max(1, n // max(1, t_disc - 1))
        args.uniform_disc = int(round(n ** (1.0 / d))) + 1
    uniform = run_arm(case, args.uniform_disc, **common)
    print(f"[uniform disc={args.uniform_disc}] rel-L2 "
          f"{uniform['rel_l2']:.3e} n_test {uniform['n_test_final']} "
          f"wall {uniform['wall_s']:.0f}s")

    out = args.out or os.path.join(
        os.path.dirname(__file__), "results", "adaptive_study.json"
    )
    payload = {
        "case": args.case, "kappa": args.kappa,
        "coarse_disc": args.coarse_disc, "uniform_disc": args.uniform_disc,
        "epochs": args.epochs, "rounds": args.rounds, "frac": args.frac,
        "warmup": args.warmup,
        "lm": [args.lm_steps, args.lm_cg], "seed": args.seed,
        "adaptive": adaptive, "uniform": uniform,
    }
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
            if not isinstance(existing, list):
                existing = [existing]
    existing.append(payload)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
