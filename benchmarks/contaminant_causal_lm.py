"""LM polish of the persisted causal contaminant theta (separate from the
training run: both in-line LM attempts died to UNAVAILABLE device errors
at LM start — suspected HBM pressure of the width-96/ff128/9.9M-pt LM
program through the tunnel; this retries from the SAFE persisted state
with a larger k_chunks so nothing is lost if it faults again).

Run: python benchmarks/contaminant_causal_lm.py [--k-chunks 48]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import contaminant_transport_2d  # noqa: E402
from varnet_tpu.utils.io import (  # noqa: E402
    load_theta_npz,
    persist_theta_if_better,
    save_theta_npz,
)

from benchmarks.fdm_scoring import score_vs_fdm  # noqa: E402

DATA = Path(__file__).parent / "data"
RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm-steps", type=int, default=8)
    ap.add_argument("--lm-cg", type=int, default=100)
    ap.add_argument("--k-chunks", type=int, default=48)
    ap.add_argument("--disc", type=int, default=64)
    ap.add_argument("--tdisc", type=int, default=40)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest LM checkpoint in the "
                         "work folder (run_resumable.sh adds this on "
                         "attempts 2+)")
    args = ap.parse_args()

    theta = load_theta_npz(RESULTS / "theta_contaminant_causal.npz")
    case = contaminant_transport_2d()  # defaults ARE the original params
    vn = VarNet(case["pde"], layer_width=(96, 96, 96), disc_num=args.disc,
                b_disc_num=args.disc, t_disc_num=args.tdisc, seed=0,
                input_scaling=False, fourier_features=128,
                fourier_scale=[0.5, 2.0])
    vn.theta = theta

    z = np.load(DATA / "contaminant_fdm.npz")

    def score():
        overall, per_time, _ = score_vs_fdm(vn, z)
        return overall, per_time

    base, _ = score()
    print(f"[causal-lm] warm-start rel-L2 {base:.4e}", flush=True)
    t0 = time.perf_counter()
    vn.refine_lm(steps=args.lm_steps, weight=(1.0, 10.0, 10.0),
                 cg_iters=args.lm_cg, cg_segment=50, k_chunks=args.k_chunks,
                 save_freq=1, verbose=True, resume=args.resume,
                 folderpath="/tmp/causal_lm_retry", max_retries=2)
    after, per_time = score()
    print(f"[causal-lm] polished rel-L2 {after:.4e} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    if after < base:
        # Provenance (ADVICE r3): the warm-start score goes under a
        # neutral key (it may itself be a prior LM result, not Adam),
        # and LM iterations / polish wall accumulate across invocations.
        rec = json.loads((RESULTS / "contaminant_causal.json").read_text())
        prev_iters = int(rec.get("lm_total_iters", 0))
        prev_wall = float(rec.get("lm_total_wall_s", 0.0))
        rec.pop("adam_rel_l2", None)
        rec.update(overall_rel_l2=after, per_time=per_time, phase="lm",
                   prev_rel_l2=base,
                   lm_total_iters=prev_iters + args.lm_steps,
                   lm_total_wall_s=prev_wall + (time.perf_counter() - t0),
                   lm=f"+{args.lm_steps} iters cg={args.lm_cg} "
                      f"k_chunks={args.k_chunks} (cumulative "
                      f"{prev_iters + args.lm_steps})")
        (RESULTS / "contaminant_causal.json").write_text(
            json.dumps(rec, indent=2))
        net = vn.theta["net"] if isinstance(vn.theta, dict) else vn.theta
        persist_theta_if_better(
            RESULTS / "theta_contaminant_causal.npz", net, after,
            write_fn=lambda p: save_theta_npz(p, net))
        print("[causal-lm] JSON + theta updated", flush=True)


if __name__ == "__main__":
    main()
