"""Representation probe for the ORIGINAL contaminant config (VERDICT r2
next #2a, de-risking step).

Round 2 measured a ~30% supervised-fit floor for the plain 48^3 tanh net
at kappa=0.01/sigma=0.06 (DESIGN.md 'zero-data attractor' — root cause
(b): representation).  Before spending an hour on causal training, this
probe fits candidate networks DIRECTLY to the CN-FDM field (no PDE, no
weak form) — whatever floor the supervised fit hits lower-bounds any
PDE-trained result with that basis.  Output picks the basis for
benchmarks/contaminant_causal.py.

Run: python benchmarks/contaminant_rep_probe.py   (TPU, ~4 min)
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

    from varnet_tpu.models.mlp import (ff_apply, init_mlp, make_fourier_features,
                                       make_input_scaling, mlp_apply)
    from varnet_tpu.utils.helpers import (matmul_precision_scope,
                                          enable_compilation_cache, rel_l2_error)

    enable_compilation_cache()
    z = np.load(DATA / "contaminant_fdm.npz")
    x_sp = z["x"].astype(np.float32)            # [P, 2] in-domain points
    times = z["times"].astype(np.float32)       # [S]
    u = z["u"].astype(np.float32)               # [S, P]
    # full space-time point cloud (every snapshot incl. t=0)
    pts = np.concatenate(
        [np.concatenate([x_sp, np.full((len(x_sp), 1), t, np.float32)], 1)
         for t in times])
    vals = u.reshape(-1)
    lo = pts.min(0)
    hi = pts.max(0)
    scale, shift = make_input_scaling(lo, hi)
    pts_d = jnp.asarray(pts)
    vals_d = jnp.asarray(vals)

    def fit(apply_fn, params, epochs=4000, lr=2e-3):
        opt = optax.adam(optax.exponential_decay(lr, epochs // 3, 0.4))
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
        return rel_l2_error(pred, np.asarray(vals))

    key = jax.random.PRNGKey(0)
    out = {}
    with matmul_precision_scope("highest"):
        for name, width, nf, ffs in [
            ("plain_w48", 48, 0, 0.0),
            ("plain_w96", 96, 0, 0.0),
            ("ff64_s0.5_w96", 96, 64, 0.5),
            ("ff64_s1.0_w96", 96, 64, 1.0),
            ("ff128_s1.0_w96", 96, 128, 1.0),
            ("ff64_s2.0_w96", 96, 64, 2.0),
        ]:
            k1, k2, key = jax.random.split(key, 3)
            t0 = time.perf_counter()
            if nf:
                b_mat = make_fourier_features(k1, 3, nf, ffs)
                params = init_mlp(k2, 2 * nf, (width,) * 3)
                fn = lambda p, x: ff_apply(b_mat, p, x, scale=scale, shift=shift)
            else:
                params = init_mlp(k2, 3, (width,) * 3)
                fn = lambda p, x: mlp_apply(p, x, scale=scale, shift=shift)
            err = fit(fn, params)
            out[name] = {"rel_l2": err, "wall_s": time.perf_counter() - t0}
            print(f"[probe] {name}: supervised rel-L2 {err:.3e}", flush=True)

    out["note"] = ("supervised fit of the CN-FDM field at ORIGINAL "
                   "kappa=0.01/sigma=0.06; lower bound for any PDE-trained "
                   "result with the same basis")
    out["date"] = "2026-08-17"
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "contaminant_rep_probe.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
