"""Training-layer tests: step correctness, sharding equivalence, batching,
checkpoint round-trip, and the high-level VarNet API.

The sharding-equivalence test is the TPU-world "fake backend" the reference
never had (SURVEY.md §4): an 8-virtual-device CPU mesh must produce the
same losses/updates as a single device.
"""

import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.assembly import build_fixed_data, pad_points, pad_quad
from varnet_tpu.models.mlp import init_mlp
from varnet_tpu.parallel.mesh import make_mesh, replicate, shard_points, shard_quad
from varnet_tpu.problems.analytic import steady_ad_1d, transient_ad_1d
from varnet_tpu.train.loss import make_loss_fn
from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
from varnet_tpu.train.trainer import _tree_reshape_batches, make_train_step


def _setup(n_devices, pad=None, kappa=0.1):
    case = steady_ad_1d(kappa=kappa)
    pad = pad or n_devices
    fd = build_fixed_data(case["pde"], 24, pad_multiple=pad)
    mesh = make_mesh(n_devices)
    quad = shard_quad(pad_quad(fd.quad, pad), mesh)
    bc = shard_points(pad_points(fd.bc, n_devices), mesh)
    loss_fn = make_loss_fn(fd.static)
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    theta = replicate(
        init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (16, 16)), mesh
    )
    opt_state = replicate(opt.init(theta), mesh)
    return case, fd, mesh, quad, bc, loss_fn, opt, theta, opt_state


def test_step_decreases_loss():
    case, fd, mesh, quad, bc, loss_fn, opt, theta, opt_state = _setup(1)
    step = make_train_step(loss_fn, opt, mesh=mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    losses = []
    for _ in range(60):
        theta, opt_state, aux = step(theta, opt_state, quad, bc, None, None, w)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_sharding_equivalence():
    """8-device shard_map step == single-device step (same update)."""
    results = {}
    for n_dev in (1, 8):
        case, fd, mesh, quad, bc, loss_fn, opt, theta, opt_state = _setup(
            n_dev, pad=8
        )
        step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
        w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
        for _ in range(3):
            theta, opt_state, aux = step(theta, opt_state, quad, bc, None, None, w)
        results[n_dev] = (jax.device_get(theta), float(aux["loss"]))
    t1, l1 = results[1]
    t8, l8 = results[8]
    assert np.isclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_batched_step_runs_and_decreases():
    case, fd, mesh, quad, bc, loss_fn, opt, theta, opt_state = _setup(2, pad=4)
    quad_h = pad_quad(fd.quad, 4)
    quad_b = _tree_reshape_batches(quad_h, 2)
    quad_d = shard_quad(quad_b, mesh, batched=True)
    step = make_train_step(loss_fn, opt, mesh=mesh, batch_num=2)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    losses = []
    for _ in range(40):
        theta, opt_state, aux = step(theta, opt_state, quad_d, bc, None, None, w)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_varnet_train_steady():
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=24, n_devices=2)
    res = vn.train(epoch_num=300, weight=(1.0, 10.0), save_freq=150, verbose=False)
    assert len(res.epochs) == 2
    assert res.losses[-1]["loss"] < res.losses[0]["loss"]
    assert res.quad_evals_per_sec > 0
    # evaluate() returns one value per point
    u = vn.evaluate(np.linspace(0, 1, 11)[:, None])
    assert u.shape == (11,)
    assert vn.compute_error() is not None


def test_varnet_train_transient():
    case = transient_ad_1d(kappa=0.05)
    vn = VarNet(
        case["pde"], layer_width=(16, 16), disc_num=16, t_disc_num=8, n_devices=2
    )
    res = vn.train(
        epoch_num=200, weight=(1.0, 10.0, 10.0), save_freq=200, verbose=False
    )
    assert "loss_ic" in res.losses[-1]
    assert res.losses[-1]["loss"] < 1e3


def test_checkpoint_roundtrip():
    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(8, 8), disc_num=12, n_devices=1)
        vn.train(
            epoch_num=50, weight=(1.0, 1.0), save_freq=25,
            folderpath=tmp, verbose=False,
        )
        theta_trained = jax.device_get(vn.theta)

        vn2 = VarNet(case["pde"], layer_width=(8, 8), disc_num=12, n_devices=1)
        step = vn2.load_model(tmp)
        assert step == 50
        for a, b in zip(
            jax.tree_util.tree_leaves(theta_trained),
            jax.tree_util.tree_leaves(vn2.theta),
        ):
            np.testing.assert_allclose(a, b)
        # resume training continues from the checkpointed epoch toward
        # the TOTAL budget (global epoch semantics, like refine_lm)
        res = vn2.train(
            epoch_num=75, weight=(1.0, 1.0), save_freq=25,
            folderpath=tmp, resume=True, verbose=False,
        )
        assert res.epochs[-1] == 75
        # budget already met: the resume is a no-op (hang-recovery loops
        # re-run the same command and must not re-train another budget)
        res2 = vn2.train(
            epoch_num=75, weight=(1.0, 1.0), save_freq=25,
            folderpath=tmp, resume=True, verbose=False,
        )
        assert res2.epochs == []
        theta75 = jax.device_get(vn2.theta)
        step75 = vn2.load_model(tmp)
        assert step75 == 75  # the no-op left the newest checkpoint alone
        for a, b in zip(jax.tree_util.tree_leaves(theta75),
                        jax.tree_util.tree_leaves(vn2.theta)):
            np.testing.assert_allclose(a, b)
        # config mismatch raises
        vn3 = VarNet(case["pde"], layer_width=(8, 4), disc_num=12, n_devices=1)
        with pytest.raises(ValueError, match="mismatch"):
            vn3.load_model(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_pad_quad_mask_roundtrip():
    case = steady_ad_1d()
    fd = build_fixed_data(case["pde"], 10, pad_multiple=1)
    q = pad_quad(fd.quad, 8)
    assert q.coords.shape[0] % 8 == 0
    assert int(q.mask.sum()) == fd.static.n_test
    # re-padding to a smaller multiple strips old padding first
    q2 = pad_quad(q, 3)
    assert q2.coords.shape[0] % 3 == 0
    assert int(q2.mask.sum()) == fd.static.n_test
    np.testing.assert_array_equal(
        q2.coords[: fd.static.n_test], fd.quad.coords[: fd.static.n_test]
    )


def test_rmsprop_and_sgd_optimizers():
    from varnet_tpu.train.optim import OptimizerConfig

    for name in ("rmsprop", "sgd"):
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1,
                    optimizer=OptimizerConfig(name=name, lr=1e-3))
        res = vn.train(epoch_num=100, weight=(1, 1), save_freq=50, verbose=False)
        assert res.losses[-1]["loss"] < res.losses[0]["loss"]


def test_compilation_cache_helper():
    import tempfile

    from varnet_tpu.utils.helpers import enable_compilation_cache

    with tempfile.TemporaryDirectory() as td:
        assert enable_compilation_cache(td) in (True, False)


def test_evaluate_cache_invalidated_on_leaf_rebind():
    """VarNet._replicated caches the device theta by LEAF identity: the
    common 'vn.theta[i][\"w\"] = new' mutation must invalidate it (a
    round-3 review found the identity-of-pytree key served stale weights)."""
    from varnet_tpu.problems.analytic import steady_ad_1d

    vn = VarNet(steady_ad_1d()["pde"], layer_width=(8,), disc_num=10,
                b_disc_num=4, n_devices=1)
    x = np.linspace(0.1, 0.9, 7)[:, None]
    u0 = vn.evaluate(x)
    vn.theta[-1]["w"] = jnp.zeros_like(vn.theta[-1]["w"])
    vn.theta[-1]["b"] = jnp.ones_like(vn.theta[-1]["b"])
    u1 = vn.evaluate(x)
    np.testing.assert_allclose(u1, 1.0, atol=1e-6)
    assert np.abs(u1 - u0).max() > 1e-3
