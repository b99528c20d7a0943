"""Config 5 (inverse source identification) to the accuracy bar.

Round 1 left this at solution 1.25e-3 / source 2.1e-2 (VERDICT r1 missing
#2); the targets are <1e-3 and <~1e-2.  Round-2 recipe: Adam (joint net +
source, deep decay) -> Levenberg-Marquardt JOINTLY over {net, src} (the
residual pytree already carries both; LM ravels the dict), optionally with
a w_obs sweep.  The LM phase rides the fused JVP/VJP kernel pair for the
trial net; the source MLP stays on XLA (tiny).

Run: python benchmarks/inverse_source_accuracy.py  (TPU, ~15 min)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.fem.assembly import PointData  # noqa: E402
from varnet_tpu.models.source import make_mlp_source  # noqa: E402
from varnet_tpu.problems.analytic import inverse_source_2d  # noqa: E402
from varnet_tpu.train.optim import OptimizerConfig  # noqa: E402
from varnet_tpu.utils.helpers import rel_l2_error  # noqa: E402
from varnet_tpu.utils.io import (  # noqa: E402
    persist_theta_if_better,
    theta_npz_dict,
)

RESULTS = Path(__file__).parent / "results"


def score(vn, case, source_fn):
    from varnet_tpu.utils.helpers import matmul_precision_scope

    pde = case["pde"]
    pts, mask = pde.domain.grid_in_domain((97, 97))
    pts = pts[mask]
    u = vn.evaluate(pts)  # exact-f32 eval by default
    u_err = rel_l2_error(u, case["c_ex"](pts))
    import jax.numpy as jnp

    with matmul_precision_scope("highest"):
        s_rec = np.asarray(
            source_fn(vn.theta["src"], jnp.asarray(pts, jnp.float32))
        )
    s_err = rel_l2_error(s_rec, case["s_true"](pts))
    return u_err, s_err


def run_one(args, w_obs):
    case = inverse_source_2d(kappa=args.kappa, n_obs=args.n_obs,
                             noise=args.noise, seed=args.seed)
    pde = case["pde"]
    lo, hi = pde.domain.bounds
    source_fn, phi0 = make_mlp_source(
        jax.random.PRNGKey(args.seed + 1), pde.dim, hidden=(args.src_width,) * 2,
        lo=lo, hi=hi,
    )
    obs = PointData(coords=case["obs_x"], values=case["obs_u"],
                    mask=np.ones(case["obs_x"].shape[0]))
    w = (1.0, 10.0, w_obs)
    vn = VarNet(
        pde, layer_width=(args.width,) * args.layers, disc_num=args.disc,
        b_disc_num=args.disc,
        optimizer=OptimizerConfig(lr=args.lr, decay_rate=0.4,
                                  decay_steps=max(args.epochs // 5, 1)),
        source_fn=source_fn, source_init=phi0, obs_data=obs,
    )
    t0 = time.perf_counter()
    vn.train(epoch_num=args.epochs, weight=w,
             save_freq=max(args.epochs // 5, 1),
             matmul_precision="highest", verbose=True)
    u_mid, s_mid = score(vn, case, source_fn)
    print(json.dumps({"stage": "adam", "w_obs": w_obs,
                      "u_rel_l2": u_mid, "source_rel_l2": s_mid}), flush=True)
    if args.lm_steps:
        vn.refine_lm(steps=args.lm_steps, weight=w, cg_iters=args.lm_cg,
                     cg_segment=40, k_chunks=4, save_freq=5,
                     matmul_precision="highest")
    u_err, s_err = score(vn, case, source_fn)
    wall = time.perf_counter() - t0
    rec = {"w_obs": w_obs, "u_rel_l2": u_err, "source_rel_l2": s_err,
           "adam_u": u_mid, "adam_source": s_mid, "wall_s": wall}
    print(json.dumps(rec), flush=True)
    # Persist the joint {net, src} parameters for the pin test —
    # improve-only on the SOLUTION rel-L2 (the pin's primary metric).
    RESULTS.mkdir(exist_ok=True)
    flat = {**theta_npz_dict(vn.theta["net"], prefix="net_"),
            **theta_npz_dict(vn.theta["src"], prefix="src_")}
    persist_theta_if_better(
        RESULTS / f"theta_inverse_source_wobs{w_obs:g}.npz", None, u_err,
        note=f"source_rel_l2={s_err:.4e}",
        write_fn=lambda pth: np.savez(pth, **flat))
    return rec, vn


def main():
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--kappa", type=float, default=0.1)
    ap.add_argument("--n-obs", type=int, default=400)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--src-width", type=int, default=16)
    ap.add_argument("--disc", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=40000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lm-steps", type=int, default=30)
    ap.add_argument("--lm-cg", type=int, default=120)
    ap.add_argument("--w-obs", type=str, default="100")
    args = ap.parse_args()

    best = None
    for w_obs in [float(v) for v in args.w_obs.split(",")]:
        rec, _ = run_one(args, w_obs)
        if best is None or rec["u_rel_l2"] < best["u_rel_l2"]:
            best = rec
    out = {
        "u_rel_l2": best["u_rel_l2"],
        "source_rel_l2": best["source_rel_l2"],
        "recipe": {
            "adam": f"{args.epochs} epochs lr {args.lr} decay 0.4/5, "
                    f"weights (1, 10, {best['w_obs']:g}), disc {args.disc}, "
                    f"net ({args.width},)x{args.layers} + src MLP "
                    f"({args.src_width},)x2, matmul highest",
            "lm": f"{args.lm_steps} joint {{net, src}} LM iters, "
                  f"cg {args.lm_cg} (segment 40), fused JVP/VJP kernels",
        },
        "sweep": {"w_obs_values": args.w_obs},
        "adam_only": {"u_rel_l2": best["adam_u"],
                      "source_rel_l2": best["adam_source"]},
    }
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "inverse_source_accuracy.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
