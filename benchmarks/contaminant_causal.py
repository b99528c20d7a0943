"""Causal (growing-time-window) training for the ORIGINAL contaminant
config (VERDICT r2 next #2a).

The kappa=0.01/sigma=0.06 volumetric-source config has homogeneous BC/IC
and trains to the u = 0 zero-data attractor under full-window training
(contaminant_validation.json "source", rel-L2 0.964; DESIGN.md).  The
attractor is TIME-GLOBAL: with the whole window in the loss, the gated
source's small contribution is swamped.  Causal curriculum makes it
local — train t in [0, T/4] first (where the source is ON and drives a
large residual share), then grow the window with warm starts, so each
stage starts from a state already carrying the plume.

Width is also raised (the measured ~30% supervised-fit floor at width 48
says the representation was too small) and input scaling is FROZEN to
the full window so theta means the same thing across stages.

Run: python benchmarks/contaminant_causal.py          (TPU, ~30-60 min)
Score target: rel-L2 < 10% vs the CN-FDM field at original parameters.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.problems.analytic import contaminant_transport_2d  # noqa: E402
from varnet_tpu.train.causal import train_causal  # noqa: E402
from varnet_tpu.train.optim import OptimizerConfig  # noqa: E402
from varnet_tpu.utils.io import (  # noqa: E402
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
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=8000,
                    help="Adam epochs per window")
    ap.add_argument("--windows", type=str, default="0.25,0.5,0.75,1.0")
    ap.add_argument("--disc", type=int, default=64)
    ap.add_argument("--tdisc", type=int, default=40,
                    help="time elements at the FULL window (dt held fixed)")
    ap.add_argument("--bdisc", type=int, default=64)
    ap.add_argument("--ff", type=int, default=128,
                    help="random Fourier features (0 = plain MLP)")
    ap.add_argument("--ff-scale", type=str, default="0.5,2.0",
                    help="FF scale, or comma-list for a multi-scale basis")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lm-steps", type=int, default=12)
    ap.add_argument("--lm-cg", type=int, default=150)
    ap.add_argument("--kappa", type=float, default=0.01)
    ap.add_argument("--sigma", type=float, default=0.06)
    ap.add_argument("--w-int", type=float, default=1.0)
    ap.add_argument("--w-bcic", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--folder", type=str, default="/tmp/contaminant_causal")
    ap.add_argument("--hard-bc", action="store_true",
                    help="exact Dirichlet BC/IC imposition inside each "
                         "window (fem/hardbc.py; composition with the "
                         "causal curriculum is library-tested) — persists "
                         "under a _hard suffix so the penalty-run pins "
                         "stay untouched")
    ap.add_argument("--resume", action="store_true",
                    help="continue a dead run from its per-stage "
                         "checkpoints (completed windows are skipped)")
    args = ap.parse_args()

    if args.hard_bc and not args.folder.endswith("_hard"):
        # the hard and penalty runs must not share checkpoint folders: a
        # hard --resume would otherwise silently restore/skip windows with
        # PENALTY-run thetas left at the default path (params-only restore
        # has no mode fingerprint) — review finding, round 3
        args.folder += "_hard"

    windows = [float(w) for w in args.windows.split(",")]
    assert windows[-1] == 1.0, "final window must cover the full interval"
    w = (args.w_int, args.w_bcic, args.w_bcic)
    extra = {}
    if args.ff:
        scales = [float(s) for s in str(args.ff_scale).split(",")]
        extra = dict(fourier_features=args.ff,
                     fourier_scale=scales[0] if len(scales) == 1 else scales)
    if args.hard_bc:
        extra["hard_bc"] = True
    stem = "contaminant_causal_hard" if args.hard_bc else "contaminant_causal"

    t0 = time.perf_counter()

    def plume_check(vn, t_end, res):
        """max |u| on a coarse grid at t = T_i — did the stage leave u=0?"""
        pts, mask = vn.pde.domain.grid_in_domain((49, 25))
        pts = pts[mask]
        umax = float(np.abs(vn.evaluate(pts, t=np.full(len(pts), t_end))).max())
        # res can be empty (fault-after-final-checkpoint / budget-met
        # no-op both return an empty TrainResult)
        loss_s = (f"{res.losses[-1]['loss']:.3e}" if res.losses
                  else "n/a (restored)")
        print(f"[causal] window [0,{t_end}]: loss {loss_s}  "
              f"max|u(T)| {umax:.3e}", flush=True)
        return {"tdisc": vn.t_disc_num, "max_abs_u_at_T": umax,
                "wall_s": time.perf_counter() - t0}

    # growing-window curriculum via the library capability; per-window
    # checkpointing under --folder (a tunnel fault mid-run loses at most
    # half a window — measured in anger: the first attempt lost 75 min of
    # trained theta to an LM-phase device error)
    vn, stage_recs = train_causal(
        lambda t_end: contaminant_transport_2d(
            kappa=args.kappa, src_sigma=args.sigma, t_final=t_end)["pde"],
        windows=windows, epoch_num=args.epochs, weight=w,
        t_disc_full=args.tdisc,
        varnet_kwargs=dict(
            layer_width=(args.width,) * args.layers, disc_num=args.disc,
            b_disc_num=args.bdisc, seed=args.seed,
            # scaling frozen across stages: the spatial map is
            # window-independent and t in [0,1] stays raw, so a stage-i
            # theta is a valid warm start for stage i+1 (train_causal
            # defaults input_scaling=False for exactly this reason)
            optimizer=OptimizerConfig(lr=args.lr, decay_rate=0.4,
                                      decay_steps=max(args.epochs // 4, 1)),
            **extra),
        train_kwargs=dict(verbose=True),
        folderpath=args.folder, stage_hook=plume_check, verbose=False,
        resume=args.resume,
    )
    stages = [{k: v for k, v in r.items() if k != "result"}
              for r in stage_recs]

    z = np.load(DATA / "contaminant_fdm.npz")

    def score(vn):
        """rel-L2 vs the CN-FDM reference field (t > 0 slices)."""
        return score_vs_fdm(vn, z)

    def persist(vn, rec, phase):
        rec["phase"] = phase
        rec["wall_s"] = time.perf_counter() - t0
        RESULTS.mkdir(exist_ok=True)
        (RESULTS / f"{stem}.json").write_text(
            json.dumps(rec, indent=2))
        if rec["overall_rel_l2"] < 0.5:  # clearly escaped u=0
            net = vn.theta["net"] if isinstance(vn.theta, dict) else vn.theta
            persist_theta_if_better(
                RESULTS / f"theta_{stem}.npz", net,
                rec["overall_rel_l2"],
                write_fn=lambda p: save_theta_npz(p, net))
        print(json.dumps(rec, indent=2), flush=True)

    # score + persist the Adam result BEFORE LM (the LM phase is the
    # longest single device session and the most likely to hit a fault)
    overall, per_time, max_u = score(vn)
    rec = {
        "overall_rel_l2": overall,
        "per_time": per_time,
        "max_abs_u_net": max_u,
        "max_abs_u_fdm": float(np.abs(z["u"]).max()),
        "stages": stages,
        "config": vars(args),
        "note": "causal growing-window training at the ORIGINAL "
                "kappa=0.01/sigma=0.06 parameters (DESIGN.md zero-data "
                "attractor).",
    }
    persist(vn, rec, phase="adam")

    if args.lm_steps:
        vn.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                     cg_segment=50, k_chunks=16, save_freq=2, verbose=True,
                     folderpath=f"{args.folder}_lm",
                     resume=args.resume, max_retries=2)
        overall2, per_time2, max_u2 = score(vn)
        if overall2 < overall:
            rec.update(overall_rel_l2=overall2, per_time=per_time2,
                       max_abs_u_net=max_u2, adam_rel_l2=overall)
            persist(vn, rec, phase="lm")
        else:
            rec["lm_rel_l2_rejected"] = overall2
            persist(vn, rec, phase="adam (lm did not improve)")


if __name__ == "__main__":
    main()
