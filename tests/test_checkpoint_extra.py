"""Checkpoint pruning, chunked evaluation, and resume-state semantics."""

import os
import shutil
import tempfile

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d
from varnet_tpu.train.checkpoint import list_checkpoint_steps


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


def test_chunked_evaluate_matches_single_shot():
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1)
    vn.train(epoch_num=20, weight=(1, 1), save_freq=10, verbose=False)
    x = np.linspace(0, 1, 501)[:, None]
    u_full = vn.evaluate(x)
    u_chunked = vn.evaluate(x, chunk=100)
    np.testing.assert_allclose(u_full, u_chunked, atol=1e-7)
    assert u_chunked.shape == (501,)
