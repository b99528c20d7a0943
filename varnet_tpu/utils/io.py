"""Observation / external-data IO.

The reference's contaminant-transport case compares against FEM (COMSOL)
data shipped as CSV/.mat (SURVEY.md §4 item 2).  These helpers load such
point data into the ``PointData`` container used by the observation loss
and by error reporting.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..fem.assembly import PointData


def point_data_from_arrays(coords, values, mask=None) -> PointData:
    """Wrap raw arrays as PointData (coords [N, c], values [N])."""
    coords = np.atleast_2d(np.asarray(coords, dtype=np.float64))
    values = np.asarray(values, dtype=np.float64).reshape(coords.shape[0])
    if mask is None:
        mask = np.ones(coords.shape[0])
    return PointData(coords=coords, values=values, mask=np.asarray(mask, float))


def load_observations_csv(
    path: str,
    coord_cols: Optional[Sequence[int]] = None,
    value_col: int = -1,
    delimiter: str = ",",
    skip_header: int = 1,
) -> PointData:
    """Load observation points from a CSV of rows [x, y, (t,) u].

    coord_cols: column indices of the network inputs (default: all but
    ``value_col``).
    """
    raw = np.genfromtxt(path, delimiter=delimiter, skip_header=skip_header)
    raw = np.atleast_2d(raw)
    n_cols = raw.shape[1]
    v = value_col % n_cols
    if coord_cols is None:
        coord_cols = [c for c in range(n_cols) if c != v]
    return point_data_from_arrays(raw[:, list(coord_cols)], raw[:, v])


def save_theta_npz(path: str, theta, prefix: str = "") -> None:
    """Persist an MLP parameter list ``[{'w','b'}, ...]`` as a flat npz
    (keys ``{prefix}l{i}_w`` / ``{prefix}l{i}_b``) — the interchange
    format used by the persisted benchmark thetas and their pin tests.
    ``prefix`` namespaces multiple nets in one file (e.g. the inverse
    problem's ``net_``/``src_`` pair)."""
    np.savez(path, **theta_npz_dict(theta, prefix))


def theta_npz_dict(theta, prefix: str = "") -> dict:
    """The flat key->array dict for ``save_theta_npz`` (exposed so call
    sites can merge several nets into one ``np.savez``)."""
    return {
        f"{prefix}l{i}_{k}": np.asarray(v)
        for i, layer in enumerate(theta)
        for k, v in layer.items()
    }


def load_theta_npz(path, prefix: str = ""):
    """Inverse of :func:`save_theta_npz`.  ``path`` may be a filename or
    an already-opened ``NpzFile``."""
    z = np.load(path) if isinstance(path, (str, os.PathLike)) else path
    n_layers = sum(
        1 for f in z.files
        if f.startswith(f"{prefix}l") and f.endswith("_w")
        and f[len(prefix):].count("_") == 1
    )
    return [
        {"w": z[f"{prefix}l{i}_w"], "b": z[f"{prefix}l{i}_b"]}
        for i in range(n_layers)
    ]


def save_solution_csv(path: str, coords: np.ndarray, values: np.ndarray,
                      header: Optional[str] = None):
    """Write a solution field as CSV rows [coords..., u]."""
    coords = np.atleast_2d(coords)
    data = np.concatenate([coords, np.asarray(values).reshape(-1, 1)], axis=1)
    if header is None:
        names = [f"x{i}" for i in range(coords.shape[1])] + ["u"]
        header = ",".join(names)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savetxt(path, data, delimiter=",", header=header, comments="")
