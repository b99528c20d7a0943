"""Directional vs jacobian-panel fused-residual kernel: full train step.

Round-2 perf experiment (VERDICT r1 weak #6): the weak integrand only
contracts du with a fixed per-point direction, so the fused residual kernel
can propagate ONE seeded tangent panel instead of n_in jacobian panels —
(1 + n_in)/2 x less matmul work per layer on paper (2x on the 2-D transient
flagship).  This measures the realized full-step (fwd+bwd+adam) throughput
of both kernels at the BENCH configuration.

Run on TPU: python benchmarks/residual_kernel_bench.py
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    ap.add_argument("--width", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=300)
    args = ap.parse_args()

    case = transient_ad_2d()
    out = {}
    for name, directional in [("jacobian", False), ("directional", True)]:
        vn = VarNet(
            case["pde"], layer_width=(args.width, args.width),
            disc_num=args.disc, b_disc_num=args.disc, t_disc_num=args.tdisc,
            fused_directional=directional,
        )
        res = vn.train(epoch_num=args.epochs, weight=(1.0, 10.0, 10.0),
                       save_freq=args.epochs, verbose=False)
        out[name] = {
            "quad_evals_per_sec": res.quad_evals_per_sec,
            "steps_per_sec": res.steps_per_sec,
            "final_loss": res.losses[-1]["loss"],
            "final_rel_l2": res.errors[-1],
        }
        print(json.dumps({name: out[name]}), flush=True)
    out["speedup"] = (out["directional"]["quad_evals_per_sec"]
                      / out["jacobian"]["quad_evals_per_sec"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
