"""Regression-pin the measured flagship accuracy headline.

Round 1 reached rel-L2 5.43e-4 (< the 1e-3 BASELINE north star) on the 2-D
transient AD flagship; the winning parameters are persisted in
``benchmarks/results/flagship_theta_5.4e-4.npz``.  This test loads them and
re-scores ``compute_error`` on the SAME eval grid (97x97 x 7 time slices)
— no training — so any refactor that breaks evaluation numerics (input
scaling, eval path, error norm, exact solution) turns CI red.
(SURVEY.md §4 "e2e criterion"; VERDICT r1 weak #1.)
"""

import os

import numpy as np
import pytest

RESULTS = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "results")


def _load_theta(path):
    z = np.load(path)
    n_layers = len(z.files) // 2
    return [
        {"w": z[f"l{i}_w"], "b": z[f"l{i}_b"]} for i in range(n_layers)
    ]


@pytest.fixture(scope="module")
def flagship_vn():
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import transient_ad_2d

    case = transient_ad_2d()
    # Discretization is irrelevant for evaluation (theta is mesh-independent);
    # keep it tiny so fixture setup stays fast.
    return VarNet(case["pde"], layer_width=(48, 48, 48), disc_num=8,
                  t_disc_num=4, n_devices=1)


def test_flagship_theta_beats_north_star(flagship_vn):
    path = os.path.join(RESULTS, "flagship_theta_5.4e-4.npz")
    theta = _load_theta(path)
    err = flagship_vn.compute_error(theta, disc=96, n_times=7)
    # Measured 5.43e-4 on TPU (f32-exact eval); allow platform noise only.
    assert err < 7e-4, f"flagship eval regression: rel-L2 {err:.3e}"
    assert err < 1e-3  # the BASELINE north-star criterion itself


def test_flagship_intermediate_theta_consistent(flagship_vn):
    """The first-LM-phase parameters score at their recorded 8.3e-4."""
    path = os.path.join(RESULTS, "flagship_theta_8.3e-4.npz")
    theta = _load_theta(path)
    err = flagship_vn.compute_error(theta, disc=96, n_times=7)
    assert 6e-4 < err < 1e-3, f"expected ~8.3e-4, got {err:.3e}"
