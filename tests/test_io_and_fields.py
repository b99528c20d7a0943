"""IO helpers (observation CSV round-trip) and input-field plotting."""

import os
import shutil
import tempfile

import numpy as np

from varnet_tpu.utils.io import (
    load_observations_csv,
    point_data_from_arrays,
    save_solution_csv,
)
from varnet_tpu.viz.plot import plot_fields
from varnet_tpu.problems.analytic import contaminant_transport_2d, steady_ad_1d


def test_csv_roundtrip():
    tmp = tempfile.mkdtemp()
    try:
        coords = np.random.rand(20, 3)
        values = np.random.rand(20)
        p = os.path.join(tmp, "obs.csv")
        save_solution_csv(p, coords, values)
        pd = load_observations_csv(p)
        np.testing.assert_allclose(pd.coords, coords, atol=1e-12)
        np.testing.assert_allclose(pd.values, values, atol=1e-12)
        assert pd.mask.sum() == 20
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_point_data_from_arrays_mask():
    pd = point_data_from_arrays(np.zeros((5, 2)), np.ones(5))
    assert pd.mask.shape == (5,)


def test_plot_fields_1d_and_2d():
    tmp = tempfile.mkdtemp()
    try:
        out1 = plot_fields(steady_ad_1d()["pde"], os.path.join(tmp, "f1"),
                           disc=12)
        assert len(out1) == 3
        out2 = plot_fields(contaminant_transport_2d()["pde"],
                           os.path.join(tmp, "f2"), disc=12, t=0.1)
        names = [os.path.basename(f) for f in out2]
        assert "field_vel_x.png" in names and "field_source.png" in names
        for f in out1 + out2:
            assert os.path.getsize(f) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
