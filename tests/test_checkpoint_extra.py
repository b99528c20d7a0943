"""Checkpoint pruning, chunked evaluation, and resume-state semantics."""

import pytest

import os
import shutil
import tempfile

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d
from varnet_tpu.train.checkpoint import list_checkpoint_steps


@pytest.mark.slow
def test_checkpoint_pruning_keeps_latest_three():
    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1)
        vn.train(epoch_num=100, weight=(1, 1), save_freq=20,
                 folderpath=tmp, verbose=False)
        steps = list_checkpoint_steps(tmp)
        assert steps == [60, 80, 100]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_params_only_restore_across_optimizers():
    """A checkpoint written with one optimizer must be loadable into a
    model configured with another (params-only fallback)."""
    from varnet_tpu.train.optim import OptimizerConfig

    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1,
                    optimizer=OptimizerConfig(lr=1e-3, decay_rate=0.5,
                                              decay_steps=10))
        vn.train(epoch_num=20, weight=(1, 1), save_freq=10,
                 folderpath=tmp, verbose=False)
        ref = [np.asarray(l) for l in
               __import__("jax").tree_util.tree_leaves(vn.theta)]
        vn2 = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1,
                     optimizer=OptimizerConfig(name="rmsprop"))
        vn2.load_model(tmp)
        got = [np.asarray(l) for l in
               __import__("jax").tree_util.tree_leaves(vn2.theta)]
        for a, b in zip(ref, got):
            np.testing.assert_allclose(a, b)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_chunked_evaluate_matches_single_shot():
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1)
    vn.train(epoch_num=20, weight=(1, 1), save_freq=10, verbose=False)
    x = np.linspace(0, 1, 501)[:, None]
    u_full = vn.evaluate(x)
    u_chunked = vn.evaluate(x, chunk=100)
    np.testing.assert_allclose(u_full, u_chunked, atol=1e-7)
    assert u_chunked.shape == (501,)
