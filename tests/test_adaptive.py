"""Adaptive test-space refinement (fem/adaptive.py, VarNet.refine_tests).

Beyond-reference capability: the reference's test grid is fixed and
uniform (SURVEY.md §0 item 2).  These tests pin the stateless geometry
recovery, the exact dedup counts on a 1-D grid, the residual-diagnostic/
loss consistency, guards, and that mixed-scale (per-node-table) training
runs sharded.
"""

import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.fem.adaptive import hat_geometry, refine_fixed
from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.problems.analytic import (
    mor_steady_ad_2d,
    steady_ad_1d,
    transient_ad_1d,
)
from varnet_tpu.train.optim import OptimizerConfig


def test_hat_geometry_roundtrip():
    # disc 10 on [0, 1]: interior nodes at i/10, spacing 0.1
    case = steady_ad_1d()
    fixed = build_fixed_data(case["pde"], disc_num=10)
    centers, spacings = hat_geometry(
        fixed.quad.coords[: fixed.static.n_test], integ_p_num=2
    )
    np.testing.assert_allclose(
        centers[:, 0], np.arange(1, 10) / 10.0, atol=1e-12
    )
    np.testing.assert_allclose(spacings, 0.1, atol=1e-12)


def test_refine_counts_exact_1d():
    # disc N: K = N-1 coarse hats; frac=1 refinement adds the 2N-1
    # interior h/2-hats (3(N-1) candidates minus overlaps); a second
    # frac=1 pass adds the 4N-1 h/4-hats under the fine rows and nothing
    # under the coarse ones (their children already exist).
    N = 10
    case = steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=N, n_devices=1)
    assert vn.static.n_test == N - 1
    info = vn.refine_tests(frac=1.0, verbose=False)
    assert info["n_added"] == 2 * N - 1
    assert vn.static.n_test == (N - 1) + (2 * N - 1)
    assert vn.fixed.quad.tables_per_node
    info2 = vn.refine_tests(frac=1.0, verbose=False)
    assert info2["n_added"] == 4 * N - 1
    # support-volume sanity: refined rows integrate sum(w) = prod(2 h_j)
    k = vn.static.n_test
    _, spacings = hat_geometry(vn.fixed.quad.coords[:k], 2)
    np.testing.assert_allclose(
        vn.fixed.quad.w[:k].sum(axis=-1), 2.0 * spacings[:, 0], rtol=1e-12
    )


@pytest.mark.slow
def test_residuals_match_loss_int():
    from varnet_tpu.train.loss import make_loss_fn

    case = steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=12, n_devices=1)
    r = vn.test_residuals()
    lf = make_loss_fn(vn.static, activation=vn.activation,
                      input_scaling=vn.input_scaling)
    _, aux = lf(vn.theta, vn.fixed.quad, vn.fixed.bc,
                weights=(1.0, 1.0, 0.0, 0.0))
    np.testing.assert_allclose(
        np.sum(r**2) / vn.static.n_test, float(aux["loss_int"]), rtol=1e-5
    )
    # ... and still consistent on the mixed-scale (per-node-table) quad
    vn.refine_tests(frac=0.25, verbose=False)
    r2 = vn.test_residuals()
    lf2 = make_loss_fn(vn.static, activation=vn.activation,
                       input_scaling=vn.input_scaling)
    _, aux2 = lf2(vn.theta, vn.fixed.quad, vn.fixed.bc,
                  weights=(1.0, 1.0, 0.0, 0.0))
    np.testing.assert_allclose(
        np.sum(r2**2) / vn.static.n_test, float(aux2["loss_int"]), rtol=1e-5
    )


def test_refine_guards():
    case = mor_steady_ad_2d()
    fixed = build_fixed_data(case["pde"], disc_num=6)
    with pytest.raises(ValueError, match="MOR"):
        refine_fixed(case["pde"], fixed,
                     np.ones(fixed.static.n_test, bool), 2)
    case1 = steady_ad_1d()
    fixed2 = build_fixed_data(case1["pde"], disc_num=8, test_order=2)
    with pytest.raises(ValueError, match="test_order"):
        refine_fixed(case1["pde"], fixed2,
                     np.ones(fixed2.static.n_test, bool), 2)
    fixed1 = build_fixed_data(case1["pde"], disc_num=8)
    with pytest.raises(ValueError, match="factor"):
        refine_fixed(case1["pde"], fixed1,
                     np.ones(fixed1.static.n_test, bool), 2, factor=1)
    vn = VarNet(case1["pde"], layer_width=(8,), disc_num=8, n_devices=1)
    with pytest.raises(ValueError, match="frac"):
        vn.refine_tests(frac=0.0)
    # flags for zero rows -> no-op
    fx, info = refine_fixed(case1["pde"], fixed1,
                            np.zeros(fixed1.static.n_test, bool), 2)
    assert info["n_added"] == 0 and fx is fixed1


@pytest.mark.slow
def test_refined_training_runs_sharded():
    # mixed-scale quad trains under the 8-virtual-device mesh (per-node
    # tables shard; pad_quad pads the enlarged K to the shard multiple)
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=12,
                optimizer=OptimizerConfig(lr=2e-3), n_devices=8)
    vn.train(epoch_num=20, weight=(1.0, 10.0), save_freq=20, verbose=False)
    info = vn.refine_tests(frac=0.3, verbose=False)
    assert info["n_added"] > 0
    res = vn.train(epoch_num=20, weight=(1.0, 10.0), save_freq=20,
                   verbose=False)
    assert np.isfinite(res.losses[-1]["loss"])


@pytest.mark.slow
def test_train_adaptive_schedule(tmp_path):
    case = steady_ad_1d(kappa=0.05)
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=10,
                optimizer=OptimizerConfig(lr=2e-3), n_devices=1)
    k0 = vn.static.n_test
    res = vn.train_adaptive(
        epoch_num=60, rounds=2, frac=0.5, weight=(1.0, 10.0),
        save_freq=20, folderpath=str(tmp_path), verbose=False,
    )
    assert vn.static.n_test > k0
    # merged history: monotone epoch numbering across the 3 stages
    assert res.epochs == sorted(res.epochs) and res.epochs[-1] == 60
    # total_steps excludes each stage's compile step (train() semantics)
    assert res.total_steps >= 54
    # refinement info recorded at the stage boundaries
    refined = [rec for rec in res.losses if "refined" in rec]
    assert len(refined) == 2
    # per-stage checkpoint lineages
    import os

    assert os.path.isdir(tmp_path / "stage0")
    assert os.path.isdir(tmp_path / "stage2")


@pytest.mark.e2e
@pytest.mark.slow
def test_adaptive_beats_uniform_continuation():
    # under-resolved boundary layer (width kappa/v = 0.02 vs h = 0.125):
    # refining the flagged layer hats beats spending the same extra
    # epochs on the uniform grid (measured 0.49 vs 0.64 rel-L2; margin
    # kept loose for optimizer noise)
    import copy

    case = steady_ad_1d(kappa=0.02)

    def make():
        return VarNet(case["pde"], layer_width=(20, 20), disc_num=8,
                      optimizer=OptimizerConfig(lr=2e-3), n_devices=1,
                      seed=3)

    vn = make()
    vn.train(epoch_num=4000, weight=(1.0, 10.0), save_freq=4000,
             verbose=False)
    theta1 = copy.deepcopy(vn.theta)
    ra = vn.train(epoch_num=4000, weight=(1.0, 10.0), save_freq=4000,
                  verbose=False)
    vn2 = make()
    vn2.theta = theta1
    vn2.refine_tests(frac=0.4, verbose=False)
    rb = vn2.train(epoch_num=4000, weight=(1.0, 10.0), save_freq=4000,
                   verbose=False)
    assert rb.errors[-1] < 0.9 * ra.errors[-1]


@pytest.mark.slow
def test_refine_transient_spacetime():
    # transient case: hats are space-time; refinement halves BOTH the
    # spatial and the temporal spacing of the flagged rows
    case = transient_ad_1d(kappa=0.05)
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=10,
                t_disc_num=6, n_devices=1)
    k0 = vn.static.n_test
    centers0, spac0 = hat_geometry(vn.fixed.quad.coords[:k0], 2)
    info = vn.refine_tests(frac=0.2, verbose=False)
    assert info["n_added"] > 0
    k1 = vn.static.n_test
    _, spac1 = hat_geometry(vn.fixed.quad.coords[:k1], 2)
    new = spac1[k0:]
    np.testing.assert_allclose(
        new, np.broadcast_to(spac0[0] / 2.0, new.shape), rtol=1e-10
    )
    res = vn.train(epoch_num=20, save_freq=20, verbose=False)
    assert np.isfinite(res.losses[-1]["loss"])
