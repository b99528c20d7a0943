"""Probe the directional residual kernel's performance bound (VERDICT r2
next #3: the tile sweep plateaus at ~1.146e9 across 8192-16384, so tile
size is not the binding constraint — find what is).

Experiments, all on the flagship bench shape (2-Dt, disc=48/tdisc=32,
4.38M quad pts):
  1. fwd-only vs fwd+bwd split (how much of the step is each kernel);
  2. width sweep at fixed tile (pass-bound <=> time flat in width,
     FLOP-bound <=> time ~ width^2);
  3. identity-activation variant (costs the VPU transcendentals);
  4. f32 'highest' vs default bf16 MXU passes.

Run: python benchmarks/kernel_probe.py   (TPU, ~2 min)
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

RESULTS = Path(__file__).parent / "results"


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from varnet_tpu.fem.assembly import build_fixed_data
    from varnet_tpu.models.mlp import init_mlp, make_input_scaling
    from varnet_tpu.ops import pallas_residual as pr
    from varnet_tpu.problems.analytic import transient_ad_2d
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 48, t_disc_num=32, b_disc_num=48)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    n_pts = st.n_test * quad.N.shape[0]
    print(f"quad points/step: {n_pts:.3e}", file=sys.stderr)

    out = {"n_pts": n_pts, "experiments": {}}

    def make_fwd(params, activation="tanh", precision=None, tile=None,
                 q_block=1):
        @jax.jit
        def f(p):
            return pr.pallas_fused_residual(
                p, quad, activation, scale, shift, time_dependent=True,
                precision=precision, tile=tile, q_block=q_block,
            )
        return functools.partial(f, params)

    def make_fwdbwd(params, activation="tanh", precision=None, tile=None,
                    q_block=1):
        @jax.jit
        def f(p):
            def loss(pp):
                r = pr.pallas_fused_residual(
                    pp, quad, activation, scale, shift, time_dependent=True,
                    precision=precision, tile=tile, q_block=q_block,
                )
                return jnp.sum(r * r)
            return jax.value_and_grad(loss)(p)
        return functools.partial(f, params)

    # 1+2: width sweep, fwd and fwd+bwd
    widths = [20, 32, 48, 64, 96]
    sweep = {}
    for w in widths:
        params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (w, w))
        tf = timeit(make_fwd(params))
        tb = timeit(make_fwdbwd(params), iters=15)
        sweep[w] = {"fwd_ms": tf * 1e3, "fwdbwd_ms": tb * 1e3,
                    "fwd_evals_per_s": n_pts / tf}
        print(f"width {w:3d}: fwd {tf*1e3:7.2f} ms  fwd+bwd {tb*1e3:7.2f} ms",
              file=sys.stderr)
    out["experiments"]["width_sweep"] = sweep

    # 3: identity activation (transcendental cost) at width 20
    orig = pr._act_pair

    def patched(name):
        if name == "lin":
            return (lambda z: z,
                    lambda z, a: jnp.ones_like(z),
                    lambda z, a, sp: jnp.zeros_like(z))
        return orig(name)

    pr._act_pair = patched
    try:
        params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (20, 20))
        tf_lin = timeit(make_fwd(params, activation="lin"))
        tb_lin = timeit(make_fwdbwd(params, activation="lin"), iters=15)
    finally:
        pr._act_pair = orig
    out["experiments"]["identity_act_w20"] = {
        "fwd_ms": tf_lin * 1e3, "fwdbwd_ms": tb_lin * 1e3,
    }
    print(f"identity act w20: fwd {tf_lin*1e3:.2f} ms  "
          f"fwd+bwd {tb_lin*1e3:.2f} ms", file=sys.stderr)

    # 4: highest-precision f32 passes at width 20
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (20, 20))
    tf_hi = timeit(make_fwd(params, precision=jax.lax.Precision.HIGHEST))
    out["experiments"]["highest_precision_w20_fwd_ms"] = tf_hi * 1e3
    print(f"highest f32 w20: fwd {tf_hi*1e3:.2f} ms", file=sys.stderr)

    # 5: q-block sweep at width 20 (the round-3 MXU-pass optimization)
    qsweep = {}
    for g in [2, 4, 6]:
        params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (20, 20))
        try:
            tf = timeit(make_fwd(params, q_block=g))
            tb = timeit(make_fwdbwd(params, q_block=g), iters=15)
        except Exception as e:  # Mosaic may reject a layout — record it
            qsweep[g] = {"error": repr(e)[:300]}
            print(f"q_block {g}: FAILED {e!r}"[:200], file=sys.stderr)
            continue
        qsweep[g] = {"fwd_ms": tf * 1e3, "fwdbwd_ms": tb * 1e3,
                     "fwd_evals_per_s": n_pts / tf}
        print(f"q_block {g}: fwd {tf*1e3:7.2f} ms  fwd+bwd {tb*1e3:7.2f} ms",
              file=sys.stderr)
    out["experiments"]["q_block_sweep_w20"] = qsweep

    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "kernel_probe.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
