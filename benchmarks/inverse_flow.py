"""Inverse FLOW identification on the contaminant channel (DESIGN.md
decision 17; the reference paper's mass-transport setting in reverse):
recover the Poiseuille peak speed u_max from sparse concentration
observations of the shipped CN-FDM inlet field, jointly with the
concentration net.

    v(x, y) = (4 u_max y (1 - y), 0),  u_max trainable (true value 1.0)

Run (TPU):  python -u benchmarks/inverse_flow.py
Smoke:      python -u benchmarks/inverse_flow.py --cpu --disc 10 ...
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path(__file__).parent / "data"
RESULTS = Path(__file__).parent / "results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kappa", type=float, default=0.03)
    ap.add_argument("--umax0", type=float, default=0.5,
                    help="wrong initial peak speed (true = 1.0)")
    ap.add_argument("--n-obs", type=int, default=300)
    ap.add_argument("--disc", type=int, default=32)
    ap.add_argument("--tdisc", type=int, default=20)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=12000)
    ap.add_argument("--lm-steps", type=int, default=20)
    ap.add_argument("--lm-cg", type=int, default=150)
    ap.add_argument("--k-chunks", type=int, default=2)
    ap.add_argument("--w-obs", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--folder", type=str, default="/tmp/inverse_flow")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from varnet_tpu.api import VarNet
    from varnet_tpu.fem.assembly import PointData
    from varnet_tpu.problems.analytic import contaminant_inlet_2d
    from varnet_tpu.train.optim import OptimizerConfig
    from varnet_tpu.utils.helpers import enable_compilation_cache, rel_l2_error

    enable_compilation_cache()

    # --- observations: subsample the shipped FDM field (t > 0) ---------
    z = np.load(DATA / "contaminant_inlet_fdm.npz")
    xs, times, u = z["x"], z["times"], z["u"]  # [N,2], [T], [T,N]
    rng = np.random.default_rng(7)
    coords, vals = [], []
    for s, t in enumerate(times):
        if t <= 0:
            continue
        # plume-weighted sampling: half where |u| is largest, half uniform
        n_t = args.n_obs // max(len(times) - 1, 1)
        order = np.argsort(-np.abs(u[s]))
        top = order[: max(n_t // 2, 1)]
        uni = rng.choice(len(xs), size=max(n_t - len(top), 1), replace=False)
        sel = np.unique(np.concatenate([top, uni]))
        coords.append(np.concatenate(
            [xs[sel], np.full((len(sel), 1), t)], axis=1))
        vals.append(u[s][sel])
    coords = np.concatenate(coords).astype(np.float32)
    vals = np.concatenate(vals).astype(np.float32)
    obs = PointData(coords=coords, values=vals,
                    mask=np.ones(len(vals), np.float32))

    # --- trainable Poiseuille speed ------------------------------------
    def vel_fn(phi, x, t):
        vx = 4.0 * phi[0] * x[:, 1] * (1.0 - x[:, 1])
        return jnp.stack([vx, jnp.zeros_like(vx)], axis=-1)

    case = contaminant_inlet_2d(kappa=args.kappa, u_max=1.0)
    t0 = time.perf_counter()
    vn = VarNet(
        case["pde"], layer_width=(args.width,) * args.layers,
        disc_num=(args.disc, args.disc // 2), b_disc_num=args.disc,
        t_disc_num=args.tdisc, seed=args.seed, n_devices=1,
        vel_fn=vel_fn, vel_init=np.array([args.umax0], np.float64),
        obs_data=obs,
        optimizer=OptimizerConfig(lr=2e-3, decay_rate=0.1,
                                  decay_steps=max(args.epochs // 4, 1)),
    )
    w = (1.0, 10.0, 10.0, args.w_obs)
    vn.train(epoch_num=args.epochs, weight=w,
             save_freq=max(args.epochs // 6, 1), verbose=True,
             matmul_precision="highest", folderpath=args.folder,
             resume=args.resume, max_retries=2)
    umax_adam = float(np.asarray(vn.theta["vel"])[0])
    print(f"[inverse_flow] u_max after Adam: {umax_adam:.4f}", flush=True)
    vn.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                 save_freq=max(args.lm_steps // 5, 1), verbose=True,
                 k_chunks=args.k_chunks, matmul_precision="highest",
                 folderpath=args.folder, resume=args.resume, max_retries=2)
    umax_lm = float(np.asarray(vn.theta["vel"])[0])

    # field error vs the full FDM reference (t > 0)
    errs = []
    for s, t in enumerate(times):
        if t <= 0:
            continue
        u_net = vn.evaluate(xs, t=np.full(len(xs), t))
        errs.append((np.asarray(u_net), u[s]))
    pred = np.concatenate([a for a, _ in errs])
    ref = np.concatenate([b for _, b in errs])
    field_rel = float(rel_l2_error(pred, ref))

    row = {
        "umax_true": 1.0,
        "umax_init": args.umax0,
        "umax_adam": umax_adam,
        "umax_recovered": umax_lm,
        "umax_rel_err": abs(umax_lm - 1.0),
        "field_rel_l2": field_rel,
        "n_obs": int(len(vals)),
        "mesh": f"disc={args.disc} tdisc={args.tdisc}",
        "network": f"({args.width},)x{args.layers}",
        "epochs": args.epochs,
        "lm": f"{args.lm_steps} iters cg={args.lm_cg}",
        "platform": jax.devices()[0].platform,
        "wall_s": time.perf_counter() - t0,
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "inverse_flow.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows.append(row)
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
