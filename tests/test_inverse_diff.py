"""Inverse DIFFUSIVITY identification (beyond-reference — the reference's
only inverse stretch is the source, BASELINE config 5): ``VarNet(
diff_fn=..., diff_init=..., obs_data=...)`` makes kappa a trainable
function jointly optimized with the net through the same weak-form loss
(train/loss.py + train/gauss_newton.py substitute diff_fn for the
precomputed quad.kappa)."""

import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import PointData
from varnet_tpu.problems.analytic import steady_ad_1d

KAPPA_TRUE = 0.08


def _softplus_kappa(psi, x, t):
    # scalar raw parameter -> positive constant field
    k = jnp.logaddexp(psi[0], 0.0)  # softplus
    return jnp.full((x.shape[0],), k)


def _case():
    case = steady_ad_1d(kappa=KAPPA_TRUE)
    xs = np.linspace(0.05, 0.95, 25)[:, None]
    obs = PointData(
        coords=xs.astype(np.float32),
        values=case["c_ex"](xs).astype(np.float32),
        mask=np.ones(len(xs), np.float32),
    )
    return case, obs


def _recovered(vn):
    return float(np.logaddexp(np.asarray(vn.theta["kap"])[0], 0.0))


def test_diff_fn_requires_init_and_no_flux():
    case, obs = _case()
    with pytest.raises(ValueError, match="diff_init"):
        VarNet(case["pde"], layer_width=(8,), disc_num=8,
               diff_fn=_softplus_kappa, obs_data=obs)
    from varnet_tpu.problems.adpde import ADPDE, NeumannBC
    from varnet_tpu.geometry.domain import Domain1D

    pde = ADPDE(Domain1D(0, 1), diff=0.1, vel=1.0,
                bcs=[0.0, NeumannBC(0.1)])
    with pytest.raises(ValueError, match="Neumann"):
        VarNet(pde, layer_width=(8,), disc_num=8,
               diff_fn=_softplus_kappa, diff_init=np.zeros(1),
               obs_data=obs)


def test_diff_fn_loss_matches_fixed_kappa():
    """With diff_fn pinned at the assembled kappa, the loss equals the
    plain problem's loss at the same net (the substitution is exact)."""
    case, obs = _case()
    # raw psi with softplus(psi) == KAPPA_TRUE
    psi0 = np.array([np.log(np.expm1(KAPPA_TRUE))], np.float64)
    vn_inv = VarNet(case["pde"], layer_width=(10,), disc_num=12, seed=2,
                    diff_fn=_softplus_kappa, diff_init=psi0,
                    obs_data=obs, n_devices=1)
    vn_fix = VarNet(case["pde"], layer_width=(10,), disc_num=12, seed=2,
                    n_devices=1)
    r1 = vn_inv.train(epoch_num=1, weight=(1.0, 10.0, 0.0), save_freq=1,
                      verbose=False)
    r2 = vn_fix.train(epoch_num=1, weight=(1.0, 10.0), save_freq=1,
                      verbose=False)
    np.testing.assert_allclose(r1.losses[0]["loss_int"],
                               r2.losses[0]["loss_int"], rtol=1e-5)


@pytest.mark.slow
def test_inverse_diffusivity_recovery():
    """Joint {net, kappa} training from a WRONG initial kappa recovers
    the true coefficient from 25 interior observations, and LM keeps
    refining through the theta['kap'] leaf."""
    case, obs = _case()
    psi0 = np.array([np.log(np.expm1(0.03))], np.float64)  # kappa0 = 0.03
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=24, seed=1,
                diff_fn=_softplus_kappa, diff_init=psi0, obs_data=obs,
                n_devices=1)
    vn.train(epoch_num=4000, weight=(1.0, 10.0, 10.0), save_freq=1000,
             verbose=False, matmul_precision="highest")
    k_adam = _recovered(vn)
    assert abs(k_adam - KAPPA_TRUE) / KAPPA_TRUE < 0.2, k_adam
    r = vn.refine_lm(steps=5, weight=(1.0, 10.0, 10.0), cg_iters=50,
                     save_freq=1, verbose=False,
                     matmul_precision="highest")
    k_lm = _recovered(vn)
    assert abs(k_lm - KAPPA_TRUE) / KAPPA_TRUE < 0.05, (k_adam, k_lm)
    assert np.isfinite(r.losses[-1]["loss"])


def _vel_scalar(phi, x, t):
    # raw scalar -> constant [P, 1] velocity (sign-free: v can be any real)
    return jnp.broadcast_to(phi[0], (x.shape[0], 1))


@pytest.mark.slow
def test_inverse_velocity_recovery():
    """Inverse FLOW identification (the reference paper's mass-transport
    setting): joint {net, v} training from a wrong initial velocity
    recovers the true advection speed — the boundary-layer shape pins
    Pe = v/kappa, and kappa is fixed here, so v is identifiable."""
    case, obs = _case()  # true v = 1.0, kappa fixed at KAPPA_TRUE
    phi0 = np.array([0.5], np.float64)  # 2x-wrong initial speed
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=24, seed=1,
                vel_fn=_vel_scalar, vel_init=phi0, obs_data=obs,
                n_devices=1)
    vn.train(epoch_num=4000, weight=(1.0, 10.0, 10.0), save_freq=1000,
             verbose=False, matmul_precision="highest")
    v_adam = float(np.asarray(vn.theta["vel"])[0])
    assert abs(v_adam - 1.0) < 0.2, v_adam
    vn.refine_lm(steps=5, weight=(1.0, 10.0, 10.0), cg_iters=50,
                 save_freq=1, verbose=False, matmul_precision="highest")
    v_lm = float(np.asarray(vn.theta["vel"])[0])
    assert abs(v_lm - 1.0) < 0.05, (v_adam, v_lm)


def test_vel_fn_requires_init():
    case, obs = _case()
    with pytest.raises(ValueError, match="vel_init"):
        VarNet(case["pde"], layer_width=(8,), disc_num=8,
               vel_fn=_vel_scalar, obs_data=obs)


def test_evaluate_field_surface():
    case, obs = _case()
    psi0 = np.array([np.log(np.expm1(0.05))], np.float64)
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=8, seed=0,
                diff_fn=_softplus_kappa, diff_init=psi0, obs_data=obs,
                n_devices=1)
    k_field = vn.evaluate_field("kappa", np.linspace(0, 1, 7)[:, None])
    np.testing.assert_allclose(k_field, 0.05, rtol=1e-6)
    with pytest.raises(ValueError, match="requires"):
        vn.evaluate_field("vel", np.zeros((3, 1)))
