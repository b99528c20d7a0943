"""Inverse COEFFICIENT identification (beyond reference — DESIGN.md
decision 17): jointly train the trial net and a trainable diffusivity
(``--recover kappa``) or advection speed (``--recover vel``) from sparse
observations of the 1-D boundary-layer solution.  The true coefficients
are kappa = 0.08, v = 1.0; the chosen one starts wrong and is recovered
through Adam + LM (identifiability: the layer shape pins Pe = v/kappa,
so exactly one of the two is trainable at a time).
Run: ``python -m varnet_tpu.examples.inverse_coeff --recover kappa``.
"""

import json

import jax.numpy as jnp
import numpy as np

from ..fem.assembly import PointData
from ..problems.analytic import steady_ad_1d
from .common import make_parser, run_case

KAPPA_TRUE = 0.08


def main(argv=None):
    p = make_parser("1D inverse coefficient identification", epochs=6000,
                    disc=24, width=16)
    p.add_argument("--recover", choices=("kappa", "vel"), default="kappa")
    p.add_argument("--n-obs", type=int, default=25)
    p.add_argument("--init-frac", type=float, default=0.4,
                   help="wrong initial coefficient = frac * true value")
    p.set_defaults(lm_steps=5)  # --lm-steps comes from make_parser
    args = p.parse_args(argv)

    case = steady_ad_1d(kappa=KAPPA_TRUE)
    xs = np.linspace(0.05, 0.95, args.n_obs)[:, None]
    obs = PointData(coords=xs.astype(np.float32),
                    values=case["c_ex"](xs).astype(np.float32),
                    mask=np.ones(len(xs), np.float32))

    if args.recover == "kappa":
        true = KAPPA_TRUE

        def diff_fn(psi, x, t):  # softplus keeps kappa positive
            return jnp.full((x.shape[0],), jnp.logaddexp(psi[0], 0.0))

        init = np.array([np.log(np.expm1(args.init_frac * true))])
        kw = dict(diff_fn=diff_fn, diff_init=init)

        def recovered(vn):
            return float(np.logaddexp(np.asarray(vn.theta["kap"])[0], 0.0))
    else:
        true = 1.0

        def vel_fn(phi, x, t):
            return jnp.broadcast_to(phi[0], (x.shape[0], 1))

        init = np.array([args.init_frac * true])
        kw = dict(vel_fn=vel_fn, vel_init=init)

        def recovered(vn):
            return float(np.asarray(vn.theta["vel"])[0])

    # run_case runs Adam AND (lm_steps > 0) the LM polish.
    vn = run_case(case["pde"], args, weight=(1.0, 10.0, 10.0),
                  obs_data=obs, **kw)
    c = recovered(vn)
    print(json.dumps({
        "recover": args.recover, "true": true,
        "init": float(args.init_frac * true),
        "recovered": c, "rel_err": abs(c - true) / true,
    }))
    return vn


if __name__ == "__main__":
    main()
