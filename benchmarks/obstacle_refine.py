"""Obstacle frontier, lever 3: residual-driven LOCAL test enrichment
(VERDICT r3 item 1 — "refine_tests near the hole", the adaptive
machinery's proven continuation scope).

The queue18 diagnosis: the d(40,20)/t24 weak residual underdetermines
rich hypothesis spaces (interior loss fell 1000x while rel-L2 rose to
88%).  queue19 attacks with a uniformly denser mesh; THIS script attacks
with targeted densification — rounds of refine_tests (top-|r| supports,
which concentrate at the rod corners where the plume detaches) each
followed by continuation Adam + LM at the enlarged test space.

Start state: --from-folder (checkpointed Adam+LM run, e.g. queue19's
/tmp/obstacle_dense) or a fresh Adam phase when absent.

Run (TPU): python -u benchmarks/obstacle_refine.py --from-folder /tmp/obstacle_dense
Appends a "hard+refine" row to obstacle_validation.json; persists
theta_obstacle_refined.npz below 5%; records the residual-adequacy ratio
(the guard built from this failure family) per round.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.obstacle_validation import build_pde  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=80)
    ap.add_argument("--tdisc", type=int, default=40)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=12000,
                    help="fresh Adam budget when --from-folder is absent")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--frac", type=float, default=0.15)
    ap.add_argument("--cont-epochs", type=int, default=4000,
                    help="continuation Adam per refinement round "
                         "(0 = straight to LM, the safest warm-start "
                         "continuation)")
    ap.add_argument("--cont-lr", type=float, default=2e-4,
                    help="Adam LR for WARM-STARTED continuation.  The "
                         "round-4 queue20 run used the ctor default "
                         "2e-3 and blew the converged 39.8%% iterate "
                         "out of its basin within 1000 epochs (int "
                         "loss 4.8e-3 -> 2.5e-2, final rel-L2 93%%); "
                         "fresh runs (no --from-folder) keep 2e-3")
    ap.add_argument("--skip-polish", action="store_true",
                    help="skip the round-0 continuation at the CURRENT "
                         "test space (round 0 is how a coarse-mesh "
                         "theta gets polished against a denser "
                         "operator before any refine_tests round)")
    ap.add_argument("--lm-steps", type=int, default=15)
    ap.add_argument("--lm-cg", type=int, default=150)
    ap.add_argument("--k-chunks", type=int, default=8)
    ap.add_argument("--from-folder", type=str, default=None,
                    help="warm-start checkpoint folder (loads the newest "
                         "LM checkpoint if present, else the newest Adam "
                         "one); mesh args must match that run's")
    ap.add_argument("--fdm-nx", type=int, default=320,
                    help="oracle resolution (320x160x800: est. field "
                         "error 0.2%% — oracle_convergence.py)")
    ap.add_argument("--fdm-nt", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="accepted for run_resumable.sh compatibility: "
                         "re-runs restart the refinement schedule from "
                         "--from-folder (refined shapes are not "
                         "checkpoint-compatible across rounds)")
    ap.add_argument("--folder", type=str, default="/tmp/obstacle_refine")
    ap.add_argument("--no-adequacy", action="store_true",
                    help="skip the per-round residual_adequacy audit")
    ap.add_argument("--adequacy-probe-n", type=int, default=16384,
                    help="probe subsample size for the per-round audit "
                         "(default ON since the subsampled probe landed "
                         "— the FULL probe cost ~45 min of host-side "
                         "table assembly on the refined space and had "
                         "forced the audit to opt-in in round 4; "
                         "0 = full probe)")
    ap.add_argument("--ff", type=int, default=0,
                    help="Fourier features (match the --from-folder "
                         "run's net, e.g. queue20 obstacle_ff_dense)")
    ap.add_argument("--ff-scale", type=str, default="0.5,2.0")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.classical import solve_ad_fdm_2d
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.utils.helpers import enable_compilation_cache
    from varnet_tpu.utils.io import persist_theta_if_better

    enable_compilation_cache()
    pde = build_pde()
    sample_times = np.linspace(0.0, 1.0, 6)
    t_fdm = time.perf_counter()
    ref = solve_ad_fdm_2d(pde, nx=args.fdm_nx, ny=args.fdm_nx // 2,
                          nt=args.fdm_nt, sample_times=sample_times)
    mask = pde.domain.in_domain(ref["x"])
    print(f"[refine] FDM oracle {args.fdm_nx}x{args.fdm_nx // 2}x"
          f"{args.fdm_nt} in {time.perf_counter() - t_fdm:.1f}s",
          flush=True)

    ff_kw = (dict(fourier_features=args.ff, input_scaling=False,
                  fourier_scale=[float(s) for s in
                                 args.ff_scale.split(",")])
             if args.ff else {})

    # resumable re-runs continue from our OWN round-0 checkpoints when
    # they exist (the from-folder source is one polish behind by then)
    if args.resume and (Path(args.folder) / "r0").exists():
        args.from_folder = f"{args.folder}/r0"

    def build(warm: bool):
        lr = args.cont_lr if warm else 2e-3
        horizon = (max(args.cont_epochs, 1) if warm else args.epochs)
        return VarNet(pde, layer_width=(args.width,) * args.layers,
                      disc_num=(args.disc, args.disc // 2),
                      t_disc_num=args.tdisc, b_disc_num=max(args.disc, 32),
                      n_devices=1, hard_bc=True, **ff_kw,
                      optimizer=OptimizerConfig(
                          lr=lr, decay_rate=0.1,
                          decay_steps=max(horizon // 4, 1)))

    vn = build(warm=bool(args.from_folder))

    def score():
        num = den = 0.0
        per_time = {}
        for s, ts in enumerate(sample_times):
            if ts <= 0.0:
                continue
            ue = ref["u"][s][mask]
            up = vn.evaluate(ref["x"][mask], t=np.full(mask.sum(), ts))
            per_time[f"{ts:.2f}"] = float(
                np.linalg.norm(up - ue) / max(np.linalg.norm(ue), 1e-30))
            num += float(np.sum((up - ue) ** 2))
            den += float(np.sum(ue**2))
        return float(np.sqrt(num / max(den, 1e-30))), per_time

    t0 = time.perf_counter()
    loaded = 0
    if args.from_folder:
        lm_dir = Path(args.from_folder) / "lm"
        src = str(lm_dir if lm_dir.exists() else args.from_folder)
        try:
            loaded = vn.load_model(src)
            print(f"[refine] warm start from {src} step {loaded}",
                  flush=True)
        except Exception as e:  # missing/incompatible: fall through
            print(f"[refine] warm start failed ({e}); fresh Adam",
                  flush=True)
            vn = build(warm=False)
    if not loaded:
        vn.train(epoch_num=args.epochs, weight=None, verbose=True,
                 save_freq=max(args.epochs // 6, 1),
                 matmul_precision="highest",
                 folderpath=f"{args.folder}/base", max_retries=2)

    base_rel, _ = score()
    print(f"[refine] start rel-L2 {base_rel:.4e}", flush=True)

    def continuation(rd):
        """Adam (at the low warm-start LR) + LM at the current space."""
        fp = f"{args.folder}/r{rd}"
        if args.cont_epochs:
            vn.train(epoch_num=args.cont_epochs, weight=None, verbose=True,
                     save_freq=max(args.cont_epochs // 4, 1),
                     matmul_precision="highest", folderpath=fp,
                     max_retries=2)
        if args.lm_steps:
            vn.refine_lm(steps=args.lm_steps, weight=None,
                         cg_iters=args.lm_cg,
                         save_freq=max(args.lm_steps // 5, 1),
                         verbose=True, k_chunks=args.k_chunks,
                         matmul_precision="highest", folderpath=fp,
                         max_retries=2)

    rounds = []

    def record(rd, info=None):
        rel, per_time = score()
        adeq = (None if args.no_adequacy else vn.residual_adequacy(
            refine=2, probe_n=args.adequacy_probe_n or None))
        rounds.append({"round": rd,
                       "n_test": (info or {}).get("n_test",
                                                  vn.static.n_test),
                       "n_added": (info or {}).get("n_added", 0),
                       "rel_l2": rel,
                       "adequacy_ratio": adeq["ratio"] if adeq else None})
        msg = (f"[refine] round {rd}: n_test {rounds[-1]['n_test']} "
               f"rel-L2 {rel:.4e}")
        if adeq:
            msg += f" adequacy {adeq['ratio']:.1f}"
        print(msg, flush=True)
        return rel, per_time

    rel, per_time = base_rel, {}
    if loaded and not args.skip_polish:
        # round 0: continuation at the CURRENT space — for a coarse-mesh
        # warm start against a denser operator this IS the experiment
        continuation(0)
        rel, per_time = record(0)
    for rd in range(1, args.rounds + 1):
        info = vn.refine_tests(frac=args.frac, factor=2)
        continuation(rd)
        rel, per_time = record(rd, info)

    rel, per_time = score()

    # dual-oracle scoring (VERDICT r4 item 6): the 320x160x800 field's
    # own est. error is ~0.5% (oracle_convergence.py Richardson) — for
    # any result below 5% also record the score against the
    # 640x320x1600 field (est. err ~0.2%) so sub-3% claims aren't
    # oracle-limited.
    rel640 = None
    if rel == rel and rel < 0.05 and args.fdm_nx < 640:
        t_fdm = time.perf_counter()
        ref640 = solve_ad_fdm_2d(pde, nx=640, ny=320, nt=1600,
                                 sample_times=sample_times)
        m640 = pde.domain.in_domain(ref640["x"])
        num = den = 0.0
        for s, ts in enumerate(sample_times):
            if ts <= 0.0:
                continue
            ue = ref640["u"][s][m640]
            up = vn.evaluate(ref640["x"][m640], t=np.full(m640.sum(), ts))
            num += float(np.sum((up - ue) ** 2))
            den += float(np.sum(ue**2))
        rel640 = float(np.sqrt(num / max(den, 1e-30)))
        print(f"[refine] 640x320x1600 oracle rel-L2 {rel640:.4e} "
              f"(solve {time.perf_counter() - t_fdm:.1f}s)", flush=True)

    row = {
        "mode": "hard+refine",
        "mesh": f"disc=({args.disc},{args.disc // 2}) tdisc={args.tdisc} "
                f"-> n_test={vn.static.n_test} ({args.rounds} rounds "
                f"frac={args.frac})",
        "network": (f"({args.width},)x{args.layers}"
                    + (f" ff{args.ff}({args.ff_scale})" if args.ff else "")),
        "warm_start": args.from_folder or f"fresh {args.epochs} epochs",
        "lm_per_round": f"{args.lm_steps} iters cg={args.lm_cg}",
        "fdm": f"{args.fdm_nx}x{args.fdm_nx // 2}x{args.fdm_nt}",
        "platform": jax.devices()[0].platform,
        "start_rel_l2": base_rel,
        "overall_rel_l2": rel if rel == rel else None,
        "oracle640_rel_l2": rel640,
        "cont_lr": args.cont_lr if loaded else None,
        "cont_epochs": args.cont_epochs,
        "per_time": {k: (v if v == v else None)
                     for k, v in per_time.items()},
        "rounds": rounds,
        "wall_s": time.perf_counter() - t0,
    }
    path = RESULTS / "obstacle_validation.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)
    if rel == rel and rel < 0.05:
        persist_theta_if_better(RESULTS / "theta_obstacle_refined.npz",
                                vn.theta, rel)


if __name__ == "__main__":
    main()
