"""Multi-seed ensemble training (VarNet.train_ensemble).

Beyond-reference capability (SURVEY.md §2 has no ensemble equivalent):
E independently-seeded nets train simultaneously in ONE jitted step,
vmapped over the member axis.  Invariants:

  * decoupling: identical members follow IDENTICAL trajectories (the
    stacked Adam update is E independent optimizers — no cross-member
    leakage through the packed psum or the optimizer);
  * parity: each member's final loss matches a sequential single-net
    run from the same init;
  * selection: the winner lands in self.theta and downstream flows
    (evaluate / refine_lm) work on it;
  * the one-packed-psum step invariant holds for the ensemble step.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d, steady_ad_2d


def _fresh(n_devices=8, **kw):
    case = steady_ad_1d(kappa=0.2)
    return VarNet(case["pde"], layer_width=(10, 10), disc_num=16,
                  n_devices=n_devices, **kw), case


@pytest.mark.slow
def test_identical_members_stay_identical():
    vn, _ = _fresh()
    theta0 = vn._init_theta(jax.random.PRNGKey(0))
    vn._init_theta = lambda k: theta0  # every member starts equal
    r = vn.train_ensemble(epoch_num=40, n_members=3, weight=(1.0, 10.0),
                          save_freq=20, verbose=False, error_disc=16)
    for losses in r.member_losses:
        np.testing.assert_allclose(losses, [losses[0]] * 3, rtol=1e-6)
    for errs in r.member_errors:
        np.testing.assert_allclose(errs, [errs[0]] * 3, rtol=1e-5)


@pytest.mark.slow
def test_ensemble_matches_sequential_runs():
    vn, _ = _fresh()
    inits = [vn._init_theta(jax.random.PRNGKey(s)) for s in (3, 4)]
    it = iter(inits)
    vn._init_theta = lambda k: next(it)
    r = vn.train_ensemble(epoch_num=60, n_members=2, weight=(1.0, 10.0),
                          save_freq=60, verbose=False, error_disc=16)

    seq_losses = []
    for th in inits:
        vn2, _ = _fresh()
        vn2.theta = jax.device_get(th)
        res = vn2.train(epoch_num=60, weight=(1.0, 10.0), save_freq=60,
                        verbose=False, error_disc=16)
        seq_losses.append(res.losses[-1]["loss"])
    np.testing.assert_allclose(r.member_losses[-1], seq_losses, rtol=2e-4)


@pytest.mark.slow
def test_selection_and_downstream_flows():
    vn, case = _fresh()
    r = vn.train_ensemble(epoch_num=120, n_members=3, weight=(1.0, 10.0),
                          save_freq=60, verbose=False, error_disc=16)
    assert r.n_members == 3
    assert 0 <= r.best_member < 3
    # winner == argmin of final member errors, and self.theta is its slice
    final = r.member_errors[-1]
    assert r.best_member == int(np.nanargmin(final))
    assert r.best_error == pytest.approx(final[r.best_member])
    stacked = vn._ensemble_thetas
    leaf = jax.tree_util.tree_leaves(vn.theta)[0]
    leaf_s = jax.tree_util.tree_leaves(stacked)[0][r.best_member]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf_s))
    # downstream: evaluate + refine_lm run on the selected member
    u = vn.evaluate(np.linspace(0.05, 0.95, 7)[:, None])
    assert np.all(np.isfinite(u))
    lm = vn.refine_lm(steps=1, weight=(1.0, 10.0), cg_iters=5, save_freq=1,
                      verbose=False, error_disc=16)
    assert np.isfinite(lm.losses[-1]["loss"])


@pytest.mark.slow
def test_evaluate_ensemble_bands():
    vn, _ = _fresh()
    vn.train_ensemble(epoch_num=40, n_members=3, weight=(1.0, 10.0),
                      save_freq=40, verbose=False, error_disc=16)
    x = np.linspace(0.1, 0.9, 9)[:, None]
    mean, std, members = vn.evaluate_ensemble(x, return_members=True)
    assert members.shape == (3, 9)
    np.testing.assert_allclose(mean, members.mean(axis=0), rtol=1e-6)
    assert np.all(std >= 0) and np.any(std > 0), "no seed spread"
    # the winner is one of the members
    np.testing.assert_allclose(
        vn.evaluate(x), members[np.argmin(np.abs(members - vn.evaluate(x)).sum(axis=1))],
        rtol=1e-6,
    )
    # no ensemble -> clear error
    vn2, _ = _fresh()
    with pytest.raises(ValueError, match="train_ensemble"):
        vn2.evaluate_ensemble(x)


@pytest.mark.slow
def test_ensemble_persistence_roundtrip(tmp_path):
    """Stacked member pytrees ride the existing theta npz helpers, so an
    ensemble persists/reloads with no new IO machinery."""
    from varnet_tpu.utils.io import load_theta_npz, save_theta_npz

    vn, _ = _fresh()
    vn.train_ensemble(epoch_num=20, n_members=2, weight=(1.0, 10.0),
                      save_freq=20, verbose=False, error_disc=16)
    path = str(tmp_path / "ens.npz")
    save_theta_npz(path, vn._ensemble_thetas)
    loaded = load_theta_npz(path)
    x = np.linspace(0.1, 0.9, 5)[:, None]
    m1, s1 = vn.evaluate_ensemble(x)
    m2, s2 = vn.evaluate_ensemble(x, thetas=loaded)
    np.testing.assert_allclose(m1, m2, rtol=1e-6)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-8)


def test_member_losses_differ_across_seeds():
    vn, _ = _fresh()
    r = vn.train_ensemble(epoch_num=30, n_members=3, weight=(1.0, 10.0),
                          save_freq=30, verbose=False, error_disc=16)
    assert len(set(r.member_losses[-1])) == 3, "seeds produced equal losses"


def test_ensemble_step_single_collective():
    """The ensemble train step still reduces EVERYTHING in one psum."""
    from varnet_tpu.fem.assembly import build_fixed_data, pad_points, pad_quad
    from varnet_tpu.parallel.mesh import make_mesh, replicate, shard_points, shard_quad
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step

    case = steady_ad_2d()
    fd = build_fixed_data(case["pde"], 8, b_disc_num=4)
    base_loss = make_loss_fn(fd.static)

    def ens_loss(theta_s, quad, bc, ic, obs, weights, prepared=None,
                 neu=None, hard=None):
        totals, _ = jax.vmap(
            lambda th: base_loss(th, quad, bc, ic, obs, weights, None, neu)
        )(theta_s)
        return jnp.sum(totals), {"member_loss": totals}

    from varnet_tpu.models.mlp import init_mlp

    mesh = make_mesh(8)
    members = [init_mlp(jax.random.PRNGKey(s), fd.static.n_inputs, (10, 10))
               for s in range(3)]
    theta_s = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)
    theta_s = replicate(theta_s, mesh)
    opt = make_optimizer(OptimizerConfig())
    opt_state = replicate(opt.init(theta_s), mesh)
    step = make_train_step(ens_loss, opt, mesh=mesh)
    quad = shard_quad(pad_quad(fd.quad, 8), mesh)
    bc = shard_points(pad_points(fd.bc, 8), mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    args = (theta_s, opt_state, quad, bc, None, None, w, None, None,
            None)
    hlo = step.jitted.lower(*args).compile().as_text()
    n = len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )
    assert n == 1, f"expected exactly 1 all-reduce, got {n}"


def test_ensemble_with_fourier_features():
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(10, 10), disc_num=16,
                fourier_features=8, fourier_scale=1.0)
    r = vn.train_ensemble(epoch_num=30, n_members=2, weight=(1.0, 10.0),
                          save_freq=30, verbose=False, error_disc=16)
    assert all(np.isfinite(v) for v in r.member_losses[-1])


@pytest.mark.slow
def test_ensemble_fused_path_matches_xla():
    """The sequential lax.map fused-kernel ensemble path (the TPU hot
    path — the vmapped XLA path OOMs at bench meshes) matches the
    vmapped XLA path member-for-member, forced on CPU via an
    interpret-mode hook (prepared layout skipped: its G/tile resolution
    assumes the compiled kernel)."""
    import functools

    case = steady_ad_2d(kappa=0.1)
    inits = [None]

    def run(fused: bool):
        vn = VarNet(case["pde"], layer_width=(10, 10), disc_num=10,
                    n_devices=8, use_pallas=fused)
        if inits[0] is None:
            inits[0] = [vn._init_theta(jax.random.PRNGKey(s)) for s in (3, 4)]
        it = iter(inits[0])
        vn._init_theta = lambda k: next(it)
        if fused:
            hook = vn._fused_residual_hook(None)
            assert hook is not None
            vn._fused_residual_hook = lambda prec: functools.partial(
                hook, interpret=True
            )
            vn._prepare_fused_layout = lambda *a, **kw: None
        return vn.train_ensemble(epoch_num=30, n_members=2,
                                 weight=(1.0, 10.0), save_freq=30,
                                 verbose=False, error_disc=12)

    r_fused = run(True)
    r_xla = run(False)
    np.testing.assert_allclose(r_fused.member_losses[-1],
                               r_xla.member_losses[-1], rtol=5e-4)


def test_ensemble_rejects_grad_clip_and_bad_args():
    from varnet_tpu.train.optim import OptimizerConfig

    vn, _ = _fresh(optimizer=OptimizerConfig(grad_clip=1.0))
    with pytest.raises(ValueError, match="grad_clip"):
        vn.train_ensemble(epoch_num=5, n_members=2, verbose=False)
    vn2, _ = _fresh()
    with pytest.raises(ValueError, match="n_members"):
        vn2.train_ensemble(epoch_num=5, n_members=1, verbose=False)
