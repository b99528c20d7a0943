"""Obstacle frontier, lever 4: causal growing-time-window curriculum.

Every obstacle arm's error concentrates at EARLY times (w48 dense:
rel-L2 0.77 @ t=0.2 vs 0.26 @ t=1.0 — the rod heat-up transient), and
the causal curriculum (train/causal.py) is the machinery that solved the
contaminant's hard-transient regime (3.64% -> 1.52% at the original
kappa=0.01).  It has never been pointed at the obstacle (VERDICT r4
weak #1).  Windows start INSIDE the ramp u = 1 - exp(-8 t) (saturated
by t ~ 0.5) so the first stage trains exactly the transient the full-
window runs under-resolve, then extends with warm starts.

Run (TPU): python -u benchmarks/obstacle_causal.py --hard-bc
Appends a "hard+causal" row to obstacle_validation.json; persists
theta_obstacle_causal.npz below 5% (improve-only guard).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.obstacle_validation import ROD_HI, ROD_LO  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def make_pde_factory():
    from varnet_tpu.geometry.domain import RectangleDomain2D
    from varnet_tpu.problems.adpde import ADPDE, NeumannBC

    hole = np.array([
        [ROD_LO[0], ROD_LO[1]], [ROD_HI[0], ROD_LO[1]],
        [ROD_HI[0], ROD_HI[1]], [ROD_LO[0], ROD_HI[1]],
    ])

    def rod_g(x, t):
        return 1.0 - np.exp(-8.0 * np.asarray(t)) * np.ones(
            np.atleast_2d(x).shape[0])

    def make_pde(t_end: float):
        dom = RectangleDomain2D((0.0, 0.0), (2.0, 1.0), holes=[hole])
        bcs = [NeumannBC(0.0), None, NeumannBC(0.0), 0.0] + [rod_g] * 4
        return ADPDE(dom, diff=0.05, vel=np.array([1.0, 0.0]),
                     source=0.0, bcs=bcs, t_interval=(0.0, t_end),
                     ic=0.0)

    return make_pde


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=40)
    ap.add_argument("--tdisc", type=int, default=24,
                    help="time elements at the FULL window (per-stage "
                         "t_disc = round(tdisc * w))")
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=8000,
                    help="Adam epochs per window")
    ap.add_argument("--windows", type=str, default="0.125,0.25,0.5,1.0")
    ap.add_argument("--lm-steps", type=int, default=30)
    ap.add_argument("--lm-cg", type=int, default=150)
    ap.add_argument("--k-chunks", type=int, default=4)
    ap.add_argument("--ff", type=int, default=0)
    ap.add_argument("--ff-scale", type=str, default="0.5,2.0")
    ap.add_argument("--fdm-nx", type=int, default=320)
    ap.add_argument("--fdm-nt", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--folder", type=str, default="/tmp/obstacle_causal")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.train.causal import train_causal
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.problems.classical import solve_ad_fdm_2d
    from varnet_tpu.utils.helpers import enable_compilation_cache
    from varnet_tpu.utils.io import persist_theta_if_better

    enable_compilation_cache()
    make_pde = make_pde_factory()
    windows = [float(w) for w in args.windows.split(",")]

    ff_kw = (dict(fourier_features=args.ff,
                  fourier_scale=[float(s) for s in
                                 args.ff_scale.split(",")])
             if args.ff else {})
    vkw = dict(layer_width=(args.width,) * args.layers,
               disc_num=(args.disc, args.disc // 2),
               b_disc_num=max(args.disc, 32), n_devices=1, hard_bc=True,
               optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.1,
                                         decay_steps=max(args.epochs // 4,
                                                         1)),
               **ff_kw)

    def stage_transfer(theta, w_prev, w_next):
        # hard-BC ansatz: u = G + tau D N with tau = t / (w T).  Growing
        # the window rescales tau by w_prev/w_next uniformly, so scaling
        # the net's OUTPUT layer by w_next/w_prev preserves the field
        # exactly on the overlap (train/causal.py stage_transfer doc).
        s = w_next / w_prev

        def scale_last(net):
            net = list(net)
            net[-1] = {"w": net[-1]["w"] * s, "b": net[-1]["b"] * s}
            return net

        if isinstance(theta, dict):
            theta = dict(theta)
            theta["net"] = scale_last(theta["net"])
            return theta
        return scale_last(theta)

    t0 = time.perf_counter()
    vn, stages = train_causal(
        make_pde, windows=windows, epoch_num=args.epochs, weight=None,
        t_disc_full=args.tdisc, varnet_kwargs=vkw,
        train_kwargs=dict(matmul_precision="highest", max_retries=2,
                          save_freq=max(args.epochs // 4, 1)),
        folderpath=args.folder, stage_transfer=stage_transfer,
        verbose=True, resume=args.resume)

    if args.lm_steps:
        vn.refine_lm(steps=args.lm_steps, weight=None,
                     cg_iters=args.lm_cg,
                     save_freq=max(args.lm_steps // 5, 1), verbose=True,
                     k_chunks=args.k_chunks, matmul_precision="highest",
                     folderpath=f"{args.folder}_full",
                     resume=args.resume, max_retries=2)
    wall = time.perf_counter() - t0

    # score against the CN-FDM oracle on the full window
    pde = make_pde(1.0)
    sample_times = np.linspace(0.0, 1.0, 6)
    ref = solve_ad_fdm_2d(pde, nx=args.fdm_nx, ny=args.fdm_nx // 2,
                          nt=args.fdm_nt, sample_times=sample_times)
    mask = pde.domain.in_domain(ref["x"])

    def score(r, m):
        num = den = 0.0
        per_time = {}
        for s, ts in enumerate(sample_times):
            if ts <= 0.0:
                continue
            ue = r["u"][s][m]
            up = vn.evaluate(r["x"][m], t=np.full(m.sum(), ts))
            per_time[f"{ts:.2f}"] = float(
                np.linalg.norm(up - ue) / max(np.linalg.norm(ue), 1e-30))
            num += float(np.sum((up - ue) ** 2))
            den += float(np.sum(ue**2))
        return float(np.sqrt(num / max(den, 1e-30))), per_time

    rel, per_time = score(ref, mask)
    rel640 = None
    if rel == rel and rel < 0.05 and args.fdm_nx < 640:
        ref640 = solve_ad_fdm_2d(pde, nx=640, ny=320, nt=1600,
                                 sample_times=sample_times)
        m640 = pde.domain.in_domain(ref640["x"])
        rel640, _ = score(ref640, m640)
        print(f"[causal] 640x320x1600 oracle rel-L2 {rel640:.4e}",
              flush=True)

    def _num(v):
        return float(v) if v == v else None

    row = {
        "mode": "hard+causal",
        "mesh": f"disc=({args.disc},{args.disc // 2}) tdisc={args.tdisc}",
        "network": (f"({args.width},)x{args.layers}"
                    + (f" ff{args.ff}({args.ff_scale})" if args.ff else "")),
        "windows": windows,
        "epochs_per_window": args.epochs,
        "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
        "fdm": f"{args.fdm_nx}x{args.fdm_nx // 2}x{args.fdm_nt}",
        "platform": jax.devices()[0].platform,
        "overall_rel_l2": _num(rel),
        "oracle640_rel_l2": rel640,
        "per_time": {k: _num(v) for k, v in per_time.items()},
        "stage_losses": [
            {"t_end": s.get("t_end"),
             "final_loss": s.get("final_loss")} for s in stages],
        "wall_s": wall,
    }
    path = RESULTS / "obstacle_validation.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)
    if rel == rel and rel < 0.05:
        persist_theta_if_better(RESULTS / "theta_obstacle_causal.npz",
                                vn.theta, rel)


if __name__ == "__main__":
    main()
