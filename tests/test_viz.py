"""Visualization layer: contour plotting, snapshots, sim_res outputs.

Reference equivalent: ``ContourPlot.py`` + ``VarNet.simRes`` (SURVEY.md
§2.1 #6, §3.3).  Assertions are structural (files written, masking
applied) — rendering itself is matplotlib's problem.
"""

import pytest

import os
import shutil
import tempfile

import numpy as np

from varnet_tpu.api import VarNet
from varnet_tpu.geometry.domain import PolygonDomain2D, RectangleDomain2D
from varnet_tpu.problems.analytic import steady_ad_1d, steady_ad_2d, transient_ad_1d
from varnet_tpu.viz.plot import ContourPlot, plot_history, plot_line_1d


def test_contourplot_masks_outside():
    # L-shaped (non-convex) domain: points in the cut-out corner are NaN
    dom = PolygonDomain2D(
        np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)
    )
    cp = ContourPlot(dom, disc=20)
    z = cp._field(np.ones(cp.points.shape[0]))
    assert np.isnan(z[-1, -1])   # (2,2) corner is outside the L
    assert z[1, 1] == 1.0        # interior point is kept


def test_con_plot_writes_file():
    tmp = tempfile.mkdtemp()
    try:
        dom = RectangleDomain2D()
        cp = ContourPlot(dom, disc=10)
        p = cp.con_plot(np.random.rand(cp.points.shape[0]),
                        path=os.path.join(tmp, "c.png"))
        assert os.path.getsize(p) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_sim_res_1d_steady_and_transient():
    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=10, n_devices=1)
        vn.train(epoch_num=20, weight=(1, 1), save_freq=10, verbose=False)
        files = vn.sim_res(os.path.join(tmp, "s"), disc=16)
        assert any(f.endswith("sol.png") for f in files)
        assert any(f.endswith("history.png") for f in files)

        case_t = transient_ad_1d()
        vt = VarNet(case_t["pde"], layer_width=(8,), disc_num=8, t_disc_num=4,
                    n_devices=1)
        vt.train(epoch_num=10, weight=(1, 1, 1), save_freq=10, verbose=False)
        files_t = vt.sim_res(os.path.join(tmp, "t"), disc=8, n_times=3)
        assert len([f for f in files_t if "sol_t" in f]) == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_sim_res_2d_steady_with_exact():
    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_2d()
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=8, n_devices=1)
        vn.train(epoch_num=10, weight=(1, 1), save_freq=10, verbose=False)
        files = vn.sim_res(tmp, disc=12)
        names = [os.path.basename(f) for f in files]
        assert "sol.png" in names
        assert "sol_exact.png" in names and "sol_abs_err.png" in names
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_sim_res_3d_slices_with_exact():
    from varnet_tpu.problems.analytic import steady_ad_3d

    tmp = tempfile.mkdtemp()
    try:
        case = steady_ad_3d()
        vn = VarNet(case["pde"], layer_width=(8,), disc_num=5,
                    b_disc_num=3, n_devices=1)
        vn.train(epoch_num=10, weight=(1, 1), save_freq=10, verbose=False)
        files = vn.sim_res(tmp, disc=8)
        names = [os.path.basename(f) for f in files]
        assert "sol_slice_x2_0.50.png" in names
        assert "abs_err_slice_x2_0.50.png" in names
        assert "error_table.json" in names
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
