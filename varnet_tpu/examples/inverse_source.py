"""BASELINE config 5 (stretch): inverse source identification.

Jointly trains the trial network u_theta AND a source network s_phi so
that (a) the weak-form residual with source s_phi vanishes and (b) u_theta
matches observations of the manufactured ground truth
u* = sin(pi x) sin(pi y).  Recovery is scored against both u* and the true
source s* = v . grad(u*) - kappa lap(u*).
Run: ``python -m varnet_tpu.examples.inverse_source``.
"""

import json

import jax
import numpy as np

from ..fem.assembly import PointData
from ..models.source import make_mlp_source
from ..problems.analytic import inverse_source_2d
from ..utils.helpers import rel_l2_error
from .common import make_parser, run_case


def main(argv=None):
    p = make_parser("2D inverse source identification", epochs=40000,
                    disc=30, save_freq=5000)
    p.add_argument("--kappa", type=float, default=0.1)
    p.add_argument("--n-obs", type=int, default=400)
    p.add_argument("--noise", type=float, default=0.0)
    args = p.parse_args(argv)
    case = inverse_source_2d(kappa=args.kappa, n_obs=args.n_obs,
                             noise=args.noise, seed=args.seed)
    pde = case["pde"]
    lo, hi = pde.domain.bounds
    source_fn, phi0 = make_mlp_source(
        jax.random.PRNGKey(args.seed + 1), pde.dim, hidden=(16, 16),
        lo=lo, hi=hi,
    )
    obs = PointData(
        coords=case["obs_x"],
        values=case["obs_u"],
        mask=np.ones(case["obs_x"].shape[0]),
    )
    vn = run_case(
        pde, args,
        weight=(1.0, 10.0, 100.0),  # (w_int, w_bc, w_obs) — steady + obs
        source_fn=source_fn,
        source_init=phi0,
        obs_data=obs,
    )
    # Score the recovered source on a grid.
    pts, mask = pde.domain.grid_in_domain((65, 65))
    pts = pts[mask]
    import jax.numpy as jnp

    s_rec = np.asarray(source_fn(vn.theta["src"], jnp.asarray(pts, jnp.float32)))
    s_err = rel_l2_error(s_rec, case["s_true"](pts))
    print(json.dumps({"source_rel_l2": s_err}))
    return vn


if __name__ == "__main__":
    main()
