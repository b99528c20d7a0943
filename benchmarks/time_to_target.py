"""Time-to-target: wall-clock from scratch to <1e-3 rel-L2 on the flagship.

The driver metric names "time-to-1e-3 rel-L2 on 2D AD-PDE" alongside
throughput (BASELINE.json).  Round 1's recipe took ~68 min on one chip;
this measures the round-2 pipeline (directional residual kernel for Adam,
fused JVP/VJP pair for LM) end to end, INCLUDING compile time.

Run: python benchmarks/time_to_target.py  (TPU, ~15 min)
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

RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    # round-3 recipe (VERDICT r2 next #1): wider net (free capacity below
    # the MXU width), shorter Adam stages, LM budget doubled + early stop
    ap.add_argument("--coarse-epochs", type=int, default=20000)
    ap.add_argument("--fine-epochs", type=int, default=3000)
    ap.add_argument("--lm-steps", type=int, default=40)
    ap.add_argument("--lm-cg", type=int, default=200)
    ap.add_argument("--width", type=int, default=48)
    # NOTE: no --hard-bc knob on purpose.  The flagship's BCs come from
    # c_ex, so exact imposition would fold the exact solution into the
    # extension G — data leakage, measured and excluded (DESIGN.md
    # decision 18).  Honest hard-BC timing evidence lives in
    # hardbc_tpu.json / contaminant_*.json instead.
    ap.add_argument("--warm", action="store_true",
                    help="record this run as the WARM-CACHE row (run it "
                         "immediately after a cold run so every jit hits "
                         "the persistent compilation cache): the result "
                         "lands under the 'warm' key of "
                         "time_to_target.json instead of replacing the "
                         "cold headline (VERDICT r3 item 7 — the "
                         "deployed-pipeline number excludes compiles)")
    ap.add_argument("--resume", action="store_true",
                    help="accepted for run_resumable.sh compatibility but "
                         "IGNORED: a timing benchmark must restart from "
                         "scratch, or the wall-clock would be meaningless")
    args = ap.parse_args()

    case = transient_ad_2d()
    w = (1.0, 10.0, 10.0)
    t0 = time.perf_counter()
    marks = {}

    # Stage 1: Adam on the coarse mesh (cheap epochs find the basin).
    vn = VarNet(case["pde"], layer_width=(args.width, args.width),
                disc_num=30, b_disc_num=30, t_disc_num=20,
                optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.4,
                                          decay_steps=args.coarse_epochs // 4))
    r1 = vn.train(epoch_num=args.coarse_epochs, weight=w,
                  save_freq=args.coarse_epochs // 4, error_disc=96,
                  error_times=7, matmul_precision="highest", verbose=True)
    marks["coarse_done_s"] = time.perf_counter() - t0
    marks["coarse_rel_l2"] = r1.best_error()

    # Stage 2: Adam on the fine mesh, warm-started (mesh-independent theta).
    vn2 = VarNet(case["pde"], layer_width=(args.width, args.width),
                 disc_num=48, b_disc_num=48, t_disc_num=32,
                 optimizer=OptimizerConfig(lr=5e-4, decay_rate=0.4,
                                           decay_steps=max(args.fine_epochs // 3, 1)))
    vn2.theta = vn.theta
    r2_errors = []
    if args.fine_epochs > 0:
        r2 = vn2.train(epoch_num=args.fine_epochs, weight=w,
                       save_freq=max(args.fine_epochs // 2, 1), error_disc=96,
                       error_times=7, matmul_precision="highest", verbose=True)
        r2_errors = r2.errors
        marks["fine_done_s"] = time.perf_counter() - t0
        marks["fine_rel_l2"] = r2.best_error()

    # Stage 3: LM on the fused JVP/VJP pair, early-stop at the target.
    r3 = vn2.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                       cg_segment=40, k_chunks=16, save_freq=1,
                       error_disc=96, error_times=7, target_error=1e-3,
                       matmul_precision="highest", verbose=True)
    wall = time.perf_counter() - t0
    best = min(e for e in (r1.errors + r2_errors + r3.errors)
               if e == e)  # drop NaNs
    out = {
        "target": 1e-3,
        "reached": best < 1e-3,
        "best_rel_l2": best,
        "wall_to_finish_s": wall,
        "marks": marks,
        "recipe": f"Adam coarse disc30 {args.coarse_epochs} -> Adam fine "
                  f"disc48 {args.fine_epochs} (warm start) -> LM "
                  f"(<= {args.lm_steps} iters, early stop at 1e-3), width "
                  f"{args.width}, all at matmul 'highest', incl. compiles",
        "round1_reference_min": 68,
    }
    RESULTS.mkdir(exist_ok=True)
    # Improve-only: the headline time_to_target.json is only overwritten by
    # a run that reached the target strictly faster than the recorded best
    # (same guard philosophy as persist_theta_if_better — a CPU smoke or an
    # unlucky re-run must not clobber the record).
    main_path = RESULTS / "time_to_target.json"
    prev = json.loads(main_path.read_text()) if main_path.exists() else None
    if args.warm:
        # warm-cache row: nested under 'warm', own improve-only guard
        out.pop("round1_reference_min", None)
        prev_warm = (prev or {}).get("warm")
        improves = out["reached"] and (
            prev_warm is None or not prev_warm.get("reached")
            or wall < prev_warm["wall_to_finish_s"])
        if improves and prev is not None:
            prev["warm"] = out
            main_path.write_text(json.dumps(prev, indent=2))
        elif not improves:
            print("[time_to_target] NOT overwriting warm row "
                  "(existing record is better)")
        else:
            # no cold record (deleted, or steps reordered): keep the
            # measured warm result in a fresh skeleton instead of
            # dropping a whole TPU run on the floor (ADVICE r4)
            main_path.write_text(json.dumps({"warm": out}, indent=2))
            print("[time_to_target] no cold record yet; wrote warm-only "
                  "skeleton")
    else:
        if prev is not None and "warm" in prev:
            out["warm"] = prev["warm"]  # carry the warm row forward
        improves = out["reached"] and (
            prev is None or not prev.get("reached")
            or wall < prev["wall_to_finish_s"])
        if improves:
            main_path.write_text(json.dumps(out, indent=2))
        else:
            print("[time_to_target] NOT overwriting time_to_target.json "
                  "(existing record is better)")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
