"""Flagship floor push: deep-LM on a disc-64 mesh from the pinned theta
(VERDICT r2 next #6).

BASELINE.md's h^2-bias study says the flagship's accuracy floor is set by
test-function spacing, not quadrature order or capacity: 2-D steady
floors at 0.21 h^2, which at disc=48 is ~9e-5 — right where the round-2
1.33e-4 theta sits.  Refining the TEST mesh to disc=64/tdisc=40 lowers
that floor ~1.8x while theta (mesh-independent) warm-starts the run, so
only the LM polish is paid, not the Adam stages.

Run: python benchmarks/flagship_push.py   (TPU; ~60-90 min at defaults,
checkpointed every iter under --folder so a timeout loses nothing)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402
from varnet_tpu.utils.io import load_theta_npz, save_theta_npz  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--theta", type=str,
                    default=str(RESULTS / "flagship_theta_1.3e-4.npz"))
    ap.add_argument("--disc", type=int, default=64)
    ap.add_argument("--tdisc", type=int, default=40)
    ap.add_argument("--lm-steps", type=int, default=40)
    ap.add_argument("--lm-cg", type=int, default=400)
    ap.add_argument("--k-chunks", type=int, default=24)
    ap.add_argument("--lam0", type=float, default=1e-3,
                    help="initial LM damping; continuations from a "
                         "converged theta should pass ~1e-9 to skip the "
                         "re-warm rejections")
    ap.add_argument("--target", type=float, default=5e-5,
                    help="early-stop rel-L2 target for the LM loop")
    ap.add_argument("--folder", type=str, default="/tmp/flagship_push")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest LM checkpoint in "
                         "--folder (theta + lam restored; global step "
                         "numbering)")
    ap.add_argument("--max-retries", type=int, default=2,
                    help="auto-resume count on transient device faults")
    args = ap.parse_args()

    case = transient_ad_2d()
    theta = load_theta_npz(args.theta)
    width = tuple(l["w"].shape[1] for l in theta[:-1])
    w = (1.0, 10.0, 10.0)

    vn = VarNet(case["pde"], layer_width=width, disc_num=args.disc,
                b_disc_num=args.disc, t_disc_num=args.tdisc)
    vn.theta = theta
    err0 = vn.compute_error(theta, disc=96, n_times=7)
    print(f"[push] warm-start rel-L2 on disc-96 eval grid: {err0:.3e}",
          flush=True)

    t0 = time.perf_counter()
    r = vn.refine_lm(
        steps=args.lm_steps, weight=w, cg_iters=args.lm_cg, cg_segment=40,
        k_chunks=args.k_chunks, save_freq=1, error_disc=96, error_times=7,
        target_error=args.target, matmul_precision="highest", verbose=True,
        lam0=args.lam0, folderpath=args.folder, resume=args.resume,
        max_retries=args.max_retries,
    )
    wall = time.perf_counter() - t0
    best = r.best_error()  # None when --resume finds all steps done
    if best is None:
        print("[push] nothing left to do (resume found all steps "
              "complete); JSON/theta untouched", flush=True)
        return
    out = {
        "warm_start_rel_l2": err0,
        "best_rel_l2": best,
        "errors_per_iter": r.errors,
        "mesh": f"disc={args.disc} b_disc={args.disc} tdisc={args.tdisc}",
        "network": f"MLP widths {width} (warm start {Path(args.theta).name})",
        "lm": f"{args.lm_steps} iters cg={args.lm_cg} seg=40 "
              f"k_chunks={args.k_chunks}",
        "wall_s": wall,
        "date": time.strftime("%Y-%m-%d"),
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "flagship_push.json"
    # append-a-row history (migrating the legacy single-object file)
    prior = json.loads(path.read_text()) if path.exists() else []
    rows = prior if isinstance(prior, list) else [prior]
    rows.append(out)
    path.write_text(json.dumps(rows, indent=2))
    if best < 1.33e-4:
        save_theta_npz(RESULTS / f"flagship_theta_{best:.1e}.npz", vn.theta)
        print(f"[push] new best theta persisted ({best:.3e})", flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
