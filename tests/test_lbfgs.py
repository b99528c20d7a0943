"""L-BFGS polish phase: must reach near-discretization-floor error on the
1-D steady problem in a few hundred iterations (the Adam-then-LBFGS
pattern that unlocks <1e-3 targets — DESIGN.md / BASELINE.md)."""

import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d


@pytest.mark.slow
def test_lm_reaches_superfine_error():
    """Levenberg-Marquardt (matrix-free GN+CG) must crush the final error
    decade: ~1e-4 rel-L2 from a lightly-Adam-trained start in ~40 iters."""
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=30, n_devices=1)
    vn.train(epoch_num=2000, weight=(1.0, 10.0), save_freq=2000, verbose=False)
    r = vn.refine_lm(steps=40, weight=(1.0, 10.0), save_freq=20,
                     verbose=False, matmul_precision=None)
    assert r.best_error() < 1e-3
    assert r.losses[-1]["loss"] < 1e-5


@pytest.mark.slow
def test_lbfgs_reaches_fine_error():
    case = steady_ad_1d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=30, n_devices=1)
    vn.train(epoch_num=2500, weight=(1.0, 10.0), save_freq=2500, verbose=False)
    r = vn.refine_lbfgs(
        steps=250, weight=(1.0, 10.0), save_freq=50, verbose=False,
        matmul_precision=None,
    )
    assert r.best_error() < 5e-3
    # the polish must improve on the short Adam phase by a lot
    assert r.best_error() < 0.05
