"""Ensemble throughput: member-evals/s vs ensemble size E.

The claim behind ``VarNet.train_ensemble`` (DESIGN.md decision 14): at
reference-scale widths the MXU is so underutilized that extra ensemble
members are nearly free — E nets in one vmapped step should cost far
less than Ex the single-net step.  This measures member quad-evals/s
for E in {2, 4, 8} against the single-net XLA-path throughput (the
ensemble rides the XLA path by design, so that is the fair x1 bar).

Writes benchmarks/results/ensemble_bench.json.  CPU-sized by default;
on TPU: --disc 48 --tdisc 32 --epochs 300 --tpu.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import transient_ad_2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=16)
    ap.add_argument("--tdisc", type=int, default=8)
    ap.add_argument("--width", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--members", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--tpu", action="store_true",
                    help="allow the real TPU (default forces CPU)")
    ap.add_argument("--out", type=str,
                    default="benchmarks/results/ensemble_bench.json")
    args = ap.parse_args()

    case = transient_ad_2d()

    def fresh():
        return VarNet(case["pde"], layer_width=(args.width, args.width),
                      disc_num=args.disc, t_disc_num=args.tdisc, seed=0,
                      use_pallas=False)

    # x1 bar: single net on the same XLA matmul-chain path.
    vn = fresh()
    r1 = vn.train(epoch_num=args.epochs, weight=(1.0, 10.0, 10.0),
                  save_freq=args.epochs, verbose=False, error_disc=16)
    single = r1.quad_evals_per_sec
    rows = {"E=1 (train, XLA path)": {
        "member_evals_per_sec": single, "scaling_vs_single": 1.0,
    }}
    print(f"[ens-bench] E=1: {single:.3e} evals/s")

    for e in args.members:
        vn = fresh()
        r = vn.train_ensemble(epoch_num=args.epochs, n_members=e,
                              weight=(1.0, 10.0, 10.0),
                              save_freq=args.epochs, verbose=False,
                              error_disc=16)
        rows[f"E={e}"] = {
            "member_evals_per_sec": r.quad_evals_per_sec,
            "scaling_vs_single": r.quad_evals_per_sec / single,
            "step_cost_vs_single": single * e / r.quad_evals_per_sec,
        }
        print(f"[ens-bench] E={e}: {r.quad_evals_per_sec:.3e} member-evals/s "
              f"= {r.quad_evals_per_sec / single:.2f}x the single-net rate "
              f"(step cost {single * e / r.quad_evals_per_sec:.2f}x)")

    out = {
        "problem": f"transient_ad_2d disc={args.disc}/tdisc={args.tdisc} "
                   f"width={args.width}",
        "epochs": args.epochs,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0].device_kind),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
