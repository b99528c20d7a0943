"""Micro-benchmark: stock XLA matmul-chain path vs fused Pallas kernel.

Times (a) the raw value+jacobian evaluation and (b) the full training step
(fwd+bwd+adam) through both paths on the flagship problem size, and checks
numerics agreement on-device.

Run on TPU: python benchmarks/kernel_bench.py [--disc 48 --tdisc 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(out):
    """Force TRUE device completion: on the remote-tunnel TPU platform,
    block_until_ready returns at dispatch, not completion — fetching a
    value is the only reliable sync."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    ap.add_argument("--width", type=int, default=20)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    from varnet_tpu.api import VarNet
    from varnet_tpu.models.mlp import init_mlp, mlp_value_and_jac
    from varnet_tpu.ops.pallas_mlp import pallas_value_and_jac
    from varnet_tpu.problems.analytic import transient_ad_2d

    import functools

    pvj = functools.partial(pallas_value_and_jac, tile=args.tile)

    # ---- raw value+jac micro-bench -----------------------------------
    case = transient_ad_2d()
    vn = VarNet(
        case["pde"], layer_width=(args.width, args.width),
        disc_num=args.disc, b_disc_num=args.disc, t_disc_num=args.tdisc,
    )
    st = vn.static
    n_pts = st.n_test * st.n_quad_per_test
    x = jnp.asarray(
        vn.fixed.quad.coords.reshape(-1, st.n_inputs), jnp.float32
    )
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (args.width,) * 2)

    f_ref = jax.jit(lambda p, x: mlp_value_and_jac(p, x))
    f_pal = jax.jit(lambda p, x: pvj(p, x))
    u0, d0 = f_ref(params, x)
    u1, d1 = f_pal(params, x)
    err_u = float(jnp.max(jnp.abs(u0 - u1)))
    err_d = float(jnp.max(jnp.abs(d0 - d1)))
    t_ref = timeit(f_ref, params, x)
    t_pal = timeit(f_pal, params, x)

    # ---- full train step through both paths --------------------------
    vn.use_pallas = False  # force the XLA matmul-chain path for the ref run
    res_ref = vn.train(epoch_num=args.epochs, weight=(1, 10, 10),
                       save_freq=args.epochs, verbose=False)
    vn2 = VarNet(
        case["pde"], layer_width=(args.width, args.width),
        disc_num=args.disc, b_disc_num=args.disc, t_disc_num=args.tdisc,
    )
    res_pal = vn2.train(epoch_num=args.epochs, weight=(1, 10, 10),
                        save_freq=args.epochs, verbose=False,
                        value_and_jac=pvj)

    print(json.dumps({
        "n_points": n_pts,
        "fwd_ms_ref": t_ref * 1e3,
        "fwd_ms_pallas": t_pal * 1e3,
        "fwd_speedup": t_ref / t_pal,
        "fwd_max_abs_err_u": err_u,
        "fwd_max_abs_err_du": err_d,
        "step_evals_per_sec_ref": res_ref.quad_evals_per_sec,
        "step_evals_per_sec_pallas": res_pal.quad_evals_per_sec,
        "step_speedup": (res_pal.quad_evals_per_sec
                         / max(res_ref.quad_evals_per_sec, 1e-9)),
        "loss_ref": res_ref.losses[-1]["loss"],
        "loss_pallas": res_pal.losses[-1]["loss"],
    }))


if __name__ == "__main__":
    main()
