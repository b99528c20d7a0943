"""Residual-adequacy guard (VarNet.residual_adequacy — VERDICT r3 item 2).

The weak residual is the method's only training signal (SURVEY.md §0
items 3-4); a test space too coarse for the hypothesis space can be
driven to ~0 while the solution gets WORSE (measured on the obstacle
case: ff128/w96 drove the interior loss 1000x down to rel-L2 88%).  The
guard re-scores residual densities on a refine-x finer probe mesh: a
converged smooth fit keeps ratio ~ 1, an aliased fit blows past the
threshold.
"""

import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.problems import analytic


def test_smooth_fit_passes():
    case = analytic.steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(20, 20), disc_num=32,
                n_devices=1)
    vn.train(epoch_num=300, weight=(1.0, 10.0), verbose=False)
    r = vn.residual_adequacy(verbose=False)
    assert not r["flagged"]
    # densities are support-volume normalized, hence mesh-comparable:
    # the probe sees essentially the same (partially trained) residual
    assert r["ratio"] < 3.0
    assert r["probe_mesh"] != r["train_mesh"]


@pytest.mark.slow
def test_aliased_fit_is_flagged():
    # high-capacity Fourier net vs a 4-element test mesh: Adam zeroes
    # the residual AT the coarse quadrature points while oscillating
    # between them — the exact obstacle-ff failure mode, miniaturized
    case = analytic.steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(32, 32), disc_num=4,
                fourier_features=64, fourier_scale=8.0,
                input_scaling=False, seed=1, n_devices=1)
    vn.train(epoch_num=3000, weight=(1.0, 10.0), verbose=False)
    r = vn.residual_adequacy(refine=4, verbose=False)
    assert r["flagged"]
    assert r["ratio"] > 100.0


def test_refine_must_refine():
    case = analytic.steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=8, n_devices=1)
    with pytest.raises(ValueError):
        vn.residual_adequacy(refine=1)


def test_density_consistency_with_loss():
    # sum(r^2)/n_test of the TRAIN mesh must equal the interior loss the
    # trainer reports (same normalization path) — the probe inherits it
    case = analytic.transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=10,
                t_disc_num=8, n_devices=1)
    res = vn.train(epoch_num=5, weight=(1.0, 1.0, 1.0), verbose=False)
    r = vn.test_residuals()
    loss_int = float(np.sum(r**2) / r.size)
    assert np.isfinite(loss_int)
    a = vn.residual_adequacy(verbose=False)
    assert a["train_rms"] == pytest.approx(np.sqrt(loss_int), rel=1e-6)


@pytest.mark.slow
def test_probe_subsample_matches_full_probe():
    """probe_n caps the probe's host-side assembly (the full probe cost
    ~45 min on the refined obstacle space, VERDICT r4 item 3); the
    subsampled RMS must sit within sampling noise of the full probe and
    reach the same verdict."""
    case = analytic.transient_ad_1d()
    vn = VarNet(case["pde"], layer_width=(16,), disc_num=24,
                t_disc_num=16, n_devices=1)
    vn.train(epoch_num=200, weight=(1.0, 10.0, 10.0), verbose=False)
    full = vn.residual_adequacy(verbose=False)
    sub = vn.residual_adequacy(probe_n=256, verbose=False)
    # full probe: (2*24-1)*(2*16-1) = 1457 classes; subsample 256
    assert sub["probe_n"] == 256
    assert "n_test=256" in sub["probe_mesh"]
    assert sub["flagged"] == full["flagged"]
    assert sub["probe_rms"] == pytest.approx(full["probe_rms"], rel=0.35)
    # deterministic in the seed, different across seeds
    again = vn.residual_adequacy(probe_n=256, verbose=False)
    assert again["probe_rms"] == sub["probe_rms"]
    other = vn.residual_adequacy(probe_n=256, probe_seed=7, verbose=False)
    assert other["probe_rms"] != sub["probe_rms"]
    assert other["probe_rms"] == pytest.approx(full["probe_rms"], rel=0.35)


def test_probe_subsample_order2():
    """order-2 probes subsample across the concatenated per-node classes
    (tables stay aligned with coords)."""
    case = analytic.steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(12,), disc_num=24,
                n_devices=1, test_order=2)
    vn.train(epoch_num=100, weight=(1.0, 10.0), verbose=False)
    full = vn.residual_adequacy(verbose=False)
    sub = vn.residual_adequacy(probe_n=32, verbose=False)
    assert "n_test=32" in sub["probe_mesh"]
    assert sub["flagged"] == full["flagged"]
    assert sub["probe_rms"] == pytest.approx(full["probe_rms"], rel=0.5)
