"""Measured MOR (parametric) accuracy: per-sample AND held-out-mu error.

VERDICT r1 missing #3: the reference's MOR mode (SURVEY.md §0 item 1, §3.5)
needs parity EVIDENCE, not just machinery.  Trains the amortized network on
the sampled mu values and scores (a) each training sample, (b) held-out mu
values never seen in training (the amortization claim), for both the 1-D
Peclet family and the 2-D boundary-layer family.

Run: python benchmarks/mor_accuracy.py  (TPU, ~10 min)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.train.optim import OptimizerConfig  # noqa: E402
from varnet_tpu.utils.helpers import rel_l2_error  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def score_mu(vn, c_ex, mu_vals, grid_pts):
    out = {}
    for v in mu_vals:
        mu = np.array([v])
        u = vn.evaluate(grid_pts, mu=mu)
        mu_b = np.broadcast_to(mu[None, :], (grid_pts.shape[0], 1))
        out[f"{v:g}"] = rel_l2_error(u, c_ex(grid_pts, None, mu_b))
    return out


def run_1d(args):
    from varnet_tpu.geometry.domain import Domain1D
    from varnet_tpu.problems.adpde import ADPDE, MORVar

    kappa = 0.1
    vels = [float(v) for v in args.samples_1d.split(",")]
    # Held-out mu: midpoints of consecutive training samples.
    holdout = [0.5 * (a + b) for a, b in zip(vels[:-1], vels[1:])]

    def vel(x, t, mu):
        n = np.atleast_2d(x).shape[0]
        v = mu[:, 0] if mu is not None else np.full(n, vels[0])
        return v[:, None]

    def c_ex(x, t, mu):
        x1 = np.atleast_2d(x)[:, 0]
        pe = (mu[:, 0] if mu is not None else vels[0]) / kappa
        return np.expm1(pe * x1) / np.expm1(pe)

    pde = ADPDE(Domain1D(0.0, 1.0), diff=kappa, vel=vel, source=0.0,
                bcs=[0.0, 1.0], c_ex=c_ex,
                mor=MORVar(samples=np.array([[v] for v in vels])))
    vn = VarNet(pde, layer_width=(args.width,) * 2, disc_num=64,
                optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.4,
                                          decay_steps=args.epochs // 5))
    t0 = time.perf_counter()
    vn.train(epoch_num=args.epochs, weight=(1.0, 10.0),
             save_freq=args.epochs // 5, matmul_precision="highest")
    if args.lm_steps:
        vn.refine_lm(steps=args.lm_steps, weight=(1.0, 10.0),
                     cg_iters=args.lm_cg, matmul_precision="highest",
                     save_freq=max(args.lm_steps // 3, 1))
    wall = time.perf_counter() - t0
    x = np.linspace(0, 1, 257)[:, None]
    return {
        "per_sample_rel_l2": score_mu(vn, c_ex, vels, x),
        "holdout_rel_l2": score_mu(vn, c_ex, holdout, x),
        "wall_s": wall,
        "config": {"disc": 64, "width": args.width, "epochs": args.epochs,
                   "lm_steps": args.lm_steps, "samples": vels,
                   "holdout": holdout},
    }


def run_2d(args):
    from varnet_tpu.problems.analytic import mor_steady_ad_2d

    vels = [float(v) for v in args.samples_2d.split(",")]
    # Held-out mu: midpoints of consecutive training samples — the
    # worst-case interpolation points of THIS run's grid, so the
    # n_mu sweep (VERDICT r3 item 5) compares like with like.
    holdout = [0.5 * (a + b) for a, b in zip(vels[:-1], vels[1:])]
    case = mor_steady_ad_2d(kappa=0.25, vels=tuple(vels))
    vn = VarNet(case["pde"], layer_width=(args.width,) * 3, disc_num=32,
                b_disc_num=32,
                optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.4,
                                          decay_steps=args.epochs // 5))
    t0 = time.perf_counter()
    vn.train(epoch_num=args.epochs, weight=(1.0, 10.0),
             save_freq=args.epochs // 5, matmul_precision="highest")
    if args.lm_steps:
        vn.refine_lm(steps=args.lm_steps, weight=(1.0, 10.0),
                     cg_iters=args.lm_cg, cg_segment=40, k_chunks=4,
                     matmul_precision="highest",
                     save_freq=max(args.lm_steps // 3, 1))
    wall = time.perf_counter() - t0
    pts, mask = case["pde"].domain.grid_in_domain((97, 97))
    pts = pts[mask]
    return {
        "per_sample_rel_l2": score_mu(vn, case["c_ex"], vels, pts),
        "holdout_rel_l2": score_mu(vn, case["c_ex"], holdout, pts),
        "wall_s": wall,
        "config": {"disc": 32, "width": args.width, "epochs": args.epochs,
                   "lm_steps": args.lm_steps, "samples": vels,
                   "holdout": holdout},
    }


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend BEFORE jax init (the "
                         "axon sitecustomize ignores JAX_PLATFORMS; an "
                         "un-forced run on a wedged tunnel hangs at "
                         "device init)")
    ap.add_argument("--epochs", type=int, default=30000)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--lm-steps", type=int, default=20)
    ap.add_argument("--lm-cg", type=int, default=100)
    ap.add_argument("--only", choices=["1d", "2d"], default=None)
    ap.add_argument("--samples-1d", type=str, default="0.5,1.0,1.5,2.0")
    ap.add_argument("--samples-2d", type=str, default="0.5,1.0,1.5,2.0")
    ap.add_argument("--key", type=str, default="mor_1d_peclet",
                    help="result key for the 1d run (e.g. mor_1d_peclet_dense)")
    ap.add_argument("--key-2d", type=str, default="mor_2d_boundary_layer")
    ap.add_argument("--resume", action="store_true",
                    help="accepted for run_resumable.sh compatibility; "
                         "runs restart (per-run wall is bounded)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out = {}
    if args.only in (None, "1d"):
        out[args.key] = run_1d(args)
        print(json.dumps({args.key: out[args.key]}), flush=True)
    if args.only in (None, "2d"):
        out[args.key_2d] = run_2d(args)
        print(json.dumps({args.key_2d: out[args.key_2d]}), flush=True)
    RESULTS.mkdir(exist_ok=True)
    existing = {}
    p = RESULTS / "mor_accuracy.json"
    if p.exists():
        existing = json.loads(p.read_text())
    existing.update(out)
    p.write_text(json.dumps(existing, indent=2))
    print(json.dumps(existing, indent=2))


if __name__ == "__main__":
    main()
