"""Pin the residual-adequacy guard on the REAL round-3 failure pair
(VERDICT r3 item 2 'done' criterion, SURVEY.md §0 items 3-4).

benchmarks/adequacy_check.py persisted the obstacle ff128/w96 solution
whose interior loss fell 1000x while rel-L2 rose to 88% as an explicitly
labeled NEGATIVE example (theta_obstacle_ff_ALIASED.npz); the 1.52%
contaminant-causal solution from the same ff128/w96 family is the
positive control.  The guard must separate them from the thetas alone,
forever — not just while the /tmp checkpoints survive.
"""

from pathlib import Path

import pytest

RESULTS = Path(__file__).resolve().parent.parent / "benchmarks" / "results"

pytestmark = pytest.mark.slow  # two w96x3 ff128 configs, probe meshes


def _require(name):
    p = RESULTS / name
    if not p.exists():
        pytest.skip(f"{name} not persisted (run benchmarks/adequacy_check.py)")
    return p


def test_aliased_obstacle_theta_is_flagged():
    from varnet_tpu.api import VarNet
    from varnet_tpu.utils.io import load_theta_npz
    from benchmarks.obstacle_validation import build_pde

    p = _require("theta_obstacle_ff_ALIASED.npz")
    vn = VarNet(build_pde(), layer_width=(96,) * 3, disc_num=(40, 20),
                t_disc_num=24, b_disc_num=40, n_devices=1, hard_bc=True,
                fourier_features=128, input_scaling=False,
                fourier_scale=[0.5, 2.0])
    vn.theta = load_theta_npz(p)
    r = vn.residual_adequacy(refine=2, verbose=False)
    assert r["flagged"]
    # measured 48.6 (adequacy_check.json) — well past the threshold of
    # 10, far under the miniaturized bait's 1e2-1e6 band
    assert r["ratio"] > 20.0


def test_solved_contaminant_theta_passes():
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_transport_2d
    from varnet_tpu.utils.io import load_theta_npz

    p = _require("theta_contaminant_causal.npz")
    case = contaminant_transport_2d()
    vn = VarNet(case["pde"], layer_width=(96, 96, 96), disc_num=64,
                b_disc_num=64, t_disc_num=40, n_devices=1, seed=0,
                input_scaling=False, fourier_features=128,
                fourier_scale=[0.5, 2.0])
    vn.theta = load_theta_npz(p)
    r = vn.residual_adequacy(refine=2, verbose=False)
    assert not r["flagged"]


def test_calibration_scale_separates_failure_modes():
    """The guard's measured scale is monotone in the failure mode
    (round 5, adequacy_check.json): 1.8 = honest underfit (w48 dense,
    39.8% but residual large EVERYWHERE -> passes), 15.4 = marginal
    aliasing (w96 on the coarse operator, the capacity-paradox
    explanation), 48.5 = full aliasing.  Scored with the subsampled
    probe (probe_n) — the affordable mode this pin also regression-
    tests at scale."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.utils.io import load_theta_npz
    from benchmarks.obstacle_validation import build_pde

    pd = _require("theta_obstacle_dense_UNDERFIT.npz")
    vd = VarNet(build_pde(), layer_width=(48, 48), disc_num=(80, 40),
                t_disc_num=40, b_disc_num=80, n_devices=1, hard_bc=True)
    vd.theta = load_theta_npz(pd)
    rd = vd.residual_adequacy(refine=2, probe_n=8192, verbose=False)
    assert not rd["flagged"], rd["ratio"]
    assert rd["ratio"] < 4.0

    pw = _require("theta_obstacle_w96_UNDERFIT.npz")
    vw = VarNet(build_pde(), layer_width=(96,) * 3, disc_num=(40, 20),
                t_disc_num=24, b_disc_num=40, n_devices=1, hard_bc=True)
    vw.theta = load_theta_npz(pw)
    rw = vw.residual_adequacy(refine=2, probe_n=8192, verbose=False)
    assert rw["flagged"], rw["ratio"]
    assert 4.0 < rw["ratio"] < 40.0
