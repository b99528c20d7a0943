"""MOR (parametric) training throughput on the fused residual kernel.

Round 2 excluded MOR from the fully-fused hot path (api.py guarded
n_mor > 0) and no parametric throughput number existed (VERDICT r2
missing #3/next #5).  Round 3 made mu rows first-class in both kernel
variants (zero contraction direction); this measures the parametric
training step end-to-end on the 2-D MOR family (4 velocity samples,
SURVEY.md §3.5).

Run: python benchmarks/mor_bench.py [--disc 128]   (TPU, ~3 min)

At small sizes (disc<=48: ~1.4e5 quad pts) BOTH paths are tunnel-
dispatch-bound (~1.3e3 steps/s) and indistinguishable; the default disc
is chosen so the parametric step is compute-bound like the flagship.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import mor_steady_ad_2d
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()

    case = mor_steady_ad_2d()
    out = {}
    for fused, label in ((True, "fused_residual_kernel"),
                         (False, "general_value_and_jac_path")):
        vn = VarNet(case["pde"], layer_width=(20, 20), disc_num=args.disc,
                    b_disc_num=args.disc, use_fused_residual=fused)
        res = vn.train(epoch_num=args.epochs, weight=(1.0, 10.0),
                       save_freq=args.epochs, verbose=False)
        out[label] = {
            "quad_evals_per_sec": res.quad_evals_per_sec,
            "steps_per_sec": res.steps_per_sec,
            "final_loss": res.losses[-1]["loss"],
        }
        print(f"{label}: {res.quad_evals_per_sec:.3e} evals/s "
              f"({res.steps_per_sec:.1f} steps/s)", file=sys.stderr)
    out["n_test"] = vn.static.n_test
    out["n_quad_per_test"] = vn.static.n_quad_per_test
    out["n_mor"] = vn.static.n_mor
    out["speedup"] = (out["fused_residual_kernel"]["quad_evals_per_sec"]
                      / out["general_value_and_jac_path"]["quad_evals_per_sec"])
    out["platform"] = jax.devices()[0].platform
    out["date"] = "2026-08-17"
    out["config"] = (f"2-D steady MOR family, 4 mu samples, disc={args.disc}, "
                     "MLP 3-20-20-1 (x, y, mu inputs)")
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "mor_bench.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
