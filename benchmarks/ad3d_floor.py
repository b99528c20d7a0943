"""Accuracy floor of the 3-D manufactured cases (geometry-only 3-D
extension, DESIGN.md decision 11): Adam + LM at ONE mesh per invocation
(re-run with different --disc for a floor comparison), appending rel-L2
rows to benchmarks/results/ad3d_floor.json.  ``--transient`` switches to
the 3-D TRANSIENT case — 4-D space-time test functions, nQ = (2q)^4 —
the deepest stress of the tensor-product quadrature machinery (rows then
carry ``"case": "transient"`` and the --tdisc used).  Runs on CPU
(small) or TPU (pass --width/--epochs up; checkpoints to --folder so
run_resumable.sh retries continue instead of restarting).

Run:  python -u benchmarks/ad3d_floor.py [--disc 8 --width 32 ...]
      python -u benchmarks/ad3d_floor.py --transient --disc 8 --tdisc 6
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).parent / "results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=8)
    ap.add_argument("--transient", action="store_true",
                    help="3-D TRANSIENT case (4-D space-time tables)")
    ap.add_argument("--tdisc", type=int, default=6,
                    help="time discretization (transient only)")
    ap.add_argument("--error-times", type=int, default=5,
                    help="eval time slices (transient only)")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--lm-steps", type=int, default=40)
    ap.add_argument("--lm-cg", type=int, default=80)
    ap.add_argument("--k-chunks", type=int, default=1,
                    help="LM interior-residual chunking (memory guard at "
                         "large 4-D space-time meshes)")
    ap.add_argument("--error-disc", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (in-process, beats the "
                         "axon sitecustomize)")
    ap.add_argument("--folder", type=str, default="/tmp/ad3d_floor")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest checkpoints in --folder "
                         "(run_resumable.sh adds this on attempts 2+)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_3d, transient_ad_3d
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    if args.transient:
        case = transient_ad_3d()
        w = (1.0, 10.0, 10.0)
        vn_kw = {"t_disc_num": args.tdisc}
        err_kw = {"error_times": args.error_times}
    else:
        case = steady_ad_3d()
        w = (1.0, 10.0)
        vn_kw = {}
        err_kw = {}
    t0 = time.perf_counter()
    vn = VarNet(case["pde"], layer_width=(args.width,) * args.layers,
                disc_num=args.disc, b_disc_num=max(args.disc, 6),
                n_devices=1, **vn_kw)
    res = vn.train(epoch_num=args.epochs, weight=w,
                   save_freq=max(args.epochs // 5, 1), verbose=True,
                   error_disc=args.error_disc, **err_kw,
                   matmul_precision="highest", folderpath=args.folder,
                   resume=args.resume, max_retries=2)
    r = vn.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                     save_freq=max(args.lm_steps // 8, 1), verbose=True,
                     error_disc=args.error_disc, **err_kw,
                     k_chunks=args.k_chunks,
                     matmul_precision="highest", folderpath=args.folder,
                     resume=args.resume, max_retries=2)
    finite = ([e for e in res.errors if e == e]
              + [e for e in r.errors if e == e])
    row = {
        "case": "transient" if args.transient else "steady",
        "disc": args.disc,
        **({"tdisc": args.tdisc} if args.transient else {}),
        "network": f"({args.width},)x{args.layers}",
        "epochs": args.epochs,
        "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
        "platform": jax.devices()[0].platform,
        # None (JSON null) when a phase recorded no finite error — e.g. a
        # resumed run whose Adam budget was already complete.  float("nan")
        # here once produced a bare `NaN` literal that broke json.loads on
        # the next append.
        "best_rel_l2": min(finite, default=None),
        "adam_rel_l2": min((e for e in res.errors if e == e),
                           default=None),
        "wall_s": time.perf_counter() - t0,
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "ad3d_floor.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
