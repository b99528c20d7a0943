"""Measure the LM (Gauss-Newton) speedup from the fused-kernel JVP/VJP pair.

Round-1 weak item #3: refine_lm ran on the XLA matmul-chain path because the
custom-VJP kernel had no forward rule; the accuracy pipeline's dominant phase
(~1875 s of the flagship recipe) was slow.  Round 2 adds the custom-JVP twin
(ops/pallas_mlp.pallas_value_and_jac_jvp); this script times both paths on
the flagship problem from the persisted 8.3e-4 parameters.

Run: python benchmarks/lm_kernel_bench.py  (real TPU, ~5 min)
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402


from varnet_tpu.utils.io import load_theta_npz as load_theta  # noqa: E402


def time_lm(vn, steps, cg_iters, cg_segment, k_chunks):
    t0 = time.perf_counter()
    r = vn.refine_lm(
        steps=1, weight=(1.0, 10.0, 10.0), cg_iters=cg_iters,
        cg_segment=cg_segment, k_chunks=k_chunks, save_freq=1,
        matmul_precision="highest", verbose=False,
    )
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = vn.refine_lm(
        steps=steps, weight=(1.0, 10.0, 10.0), cg_iters=cg_iters,
        cg_segment=cg_segment, k_chunks=k_chunks, save_freq=steps,
        matmul_precision="highest", verbose=False,
    )
    per_iter = (time.perf_counter() - t0) / steps
    return compile_and_first, per_iter, r.errors[-1], float(r.losses[-1]["loss"])


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cg-iters", type=int, default=200)
    ap.add_argument("--cg-segment", type=int, default=40)
    ap.add_argument("--k-chunks", type=int, default=16)
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    args = ap.parse_args()

    case = transient_ad_2d()
    theta = load_theta(
        Path(__file__).parent / "results" / "flagship_theta_8.3e-4.npz"
    )
    out = {}
    for name, use_pallas in [("xla", False), ("kernel", True)]:
        vn = VarNet(
            case["pde"], layer_width=(48, 48, 48), disc_num=args.disc,
            b_disc_num=args.disc, t_disc_num=args.tdisc,
            use_pallas=use_pallas,
        )
        vn.theta = [dict(l) for l in theta]
        comp, per_iter, err, loss = time_lm(
            vn, args.steps, args.cg_iters, args.cg_segment, args.k_chunks
        )
        out[name] = {"compile_plus_first_s": comp, "per_iter_s": per_iter,
                     "rel_l2": err, "loss": loss}
        print(json.dumps({name: out[name]}), flush=True)
    out["speedup"] = out["xla"]["per_iter_s"] / out["kernel"]["per_iter_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
