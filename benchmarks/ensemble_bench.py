"""Ensemble throughput: member-evals/s vs ensemble size E.

Two ensemble paths exist (DESIGN.md decision 14):

  * fused (TPU hot path, default here): members run sequentially
    through the fully-fused weak-residual kernel via ``lax.map`` —
    ~E x the single fused step, but the single fused step is ~40x the
    XLA one and VMEM-resident (no [E, P, width] HBM buffers — the
    vmapped path OOM'd at bench meshes, /tmp/tpu_queue round 3).
  * --xla: the vmapped XLA matmul-chain path — batched matmuls make
    extra members nearly free at reference widths, IF the mesh is
    small enough to materialize; --batch-num chunks it otherwise.

Each path is scored against its own single-net x1 bar.  Writes
benchmarks/results/ensemble_bench.json (rows merge across invocations).
CPU-sized by default; on TPU: --disc 48 --tdisc 32 --epochs 300 --tpu.
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
    ap.add_argument("--xla", action="store_true",
                    help="bench the vmapped XLA path instead of the "
                         "fused-kernel lax.map path")
    ap.add_argument("--batch-num", type=int, default=1,
                    help="interior mini-batches per epoch (the XLA path "
                         "needs >1 at bench-scale meshes to fit HBM)")
    ap.add_argument("--out", type=str,
                    default="benchmarks/results/ensemble_bench.json")
    args = ap.parse_args()

    case = transient_ad_2d()
    label = "XLA path" if args.xla else "fused path"

    def fresh():
        # On CPU the fused hook is ineligible either way (use_pallas
        # auto-resolves by platform), so --xla only changes TPU runs.
        return VarNet(case["pde"], layer_width=(args.width, args.width),
                      disc_num=args.disc, t_disc_num=args.tdisc, seed=0,
                      use_pallas=False if args.xla else "auto")

    # x1 bar: single net through train() on the SAME compute path.
    vn = fresh()
    r1 = vn.train(epoch_num=args.epochs, weight=(1.0, 10.0, 10.0),
                  save_freq=args.epochs, verbose=False, error_disc=16,
                  batch_num=args.batch_num)
    single = r1.quad_evals_per_sec
    rows = {f"E=1 (train, {label})": {
        "member_evals_per_sec": single, "scaling_vs_single": 1.0,
    }}
    print(f"[ens-bench] E=1 ({label}): {single:.3e} evals/s")

    for e in args.members:
        vn = fresh()
        r = vn.train_ensemble(epoch_num=args.epochs, n_members=e,
                              weight=(1.0, 10.0, 10.0),
                              save_freq=args.epochs, verbose=False,
                              error_disc=16, batch_num=args.batch_num)
        rows[f"E={e} ({label})"] = {
            "member_evals_per_sec": r.quad_evals_per_sec,
            "scaling_vs_single": r.quad_evals_per_sec / single,
            "step_cost_vs_single": single * e / r.quad_evals_per_sec,
        }
        print(f"[ens-bench] E={e} ({label}): {r.quad_evals_per_sec:.3e} "
              f"member-evals/s = {r.quad_evals_per_sec / single:.2f}x the "
              f"single-net rate "
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
    if os.path.exists(args.out):  # merge fused/--xla invocations
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("problem") == out["problem"]:
            out["rows"] = {**prev.get("rows", {}), **out["rows"]}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
