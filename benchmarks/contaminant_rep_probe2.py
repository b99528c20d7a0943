"""Deeper representation probe (stage 2) for the ORIGINAL contaminant
config — multi-scale Fourier bases + longer optimization.

Stage 1 (contaminant_rep_probe.py) measured supervised floors of ~80%
(plain tanh) and 14-17% (single-scale FF) at 4k Adam epochs.  The plume
width is sigma=0.06 -> sqrt(sigma^2 + 2 kappa t) ~ 0.06-0.15, needing
embedding frequencies well above the scale-0.5/1.0 draws, but scale 2.0
single-scale already optimizes WORSE (aliasing).  A MULTI-SCALE B
(half low-frequency for the bulk, half high for the plume) plus a longer
schedule tests whether the basis or the budget was binding.

Run: python benchmarks/contaminant_rep_probe2.py   (TPU, ~8 min)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path(__file__).parent / "data"
RESULTS = Path(__file__).parent / "results"


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from varnet_tpu.models.mlp import (ff_apply, init_mlp,
                                       make_fourier_features,
                                       make_input_scaling)
    from varnet_tpu.utils.helpers import (matmul_precision_scope,
                                          enable_compilation_cache,
                                          rel_l2_error)

    enable_compilation_cache()
    z = np.load(DATA / "contaminant_fdm.npz")
    x_sp = z["x"].astype(np.float32)
    times = z["times"].astype(np.float32)
    u = z["u"].astype(np.float32)
    pts = np.concatenate(
        [np.concatenate([x_sp, np.full((len(x_sp), 1), t, np.float32)], 1)
         for t in times])
    vals = u.reshape(-1)
    scale, shift = make_input_scaling(pts.min(0), pts.max(0))
    pts_d = jnp.asarray(pts)
    vals_d = jnp.asarray(vals)

    def fit(apply_fn, params, epochs, lr=2e-3):
        opt = optax.adam(optax.exponential_decay(lr, epochs // 4, 0.3))
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                pred = apply_fn(p, pts_d)
                return jnp.mean((pred - vals_d) ** 2)
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state2 = opt.update(g, state)
            return optax.apply_updates(params, upd), state2, loss

        for _ in range(epochs):
            params, state, loss = step(params, state)
        pred = np.asarray(jax.device_get(apply_fn(params, pts_d)))
        return rel_l2_error(pred, np.asarray(vals)), params

    def multiscale_b(key, scales_counts):
        mats = []
        for s, n in scales_counts:
            key, sub = jax.random.split(key)
            mats.append(make_fourier_features(sub, 3, n, s))
        return jnp.concatenate(mats, axis=1)

    key = jax.random.PRNGKey(1)
    out = {}
    with matmul_precision_scope("highest"):
        for name, scales_counts, width, epochs in [
            ("ff128_s1.0_w96_e12k", [(1.0, 128)], 96, 12000),
            ("ms64x0.5_64x2_w96_e12k", [(0.5, 64), (2.0, 64)], 96, 12000),
            ("ms64x0.5_64x1.5_64x3_w128_e12k",
             [(0.5, 64), (1.5, 64), (3.0, 64)], 128, 12000),
            ("ms64x0.5_64x2_w96_e30k", [(0.5, 64), (2.0, 64)], 96, 30000),
        ]:
            k1, k2, key = jax.random.split(key, 3)
            b_mat = multiscale_b(k1, scales_counts)
            params = init_mlp(k2, 2 * b_mat.shape[1], (width,) * 3)
            fn = lambda p, x: ff_apply(b_mat, p, x, scale=scale, shift=shift)
            t0 = time.perf_counter()
            err, _ = fit(fn, params, epochs)
            out[name] = {"rel_l2": err, "wall_s": time.perf_counter() - t0}
            print(f"[probe2] {name}: supervised rel-L2 {err:.3e}", flush=True)

    out["date"] = "2026-08-17"
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "contaminant_rep_probe2.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
