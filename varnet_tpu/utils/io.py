"""Observation / external-data IO.

The reference's contaminant-transport case compares against FEM (COMSOL)
data shipped as CSV/.mat (SURVEY.md §4 item 2).  These helpers load such
point data into the ``PointData`` container used by the observation loss
and by error reporting.
"""

from __future__ import annotations

import json
import os
import time
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


def persist_theta_if_better(path, theta, rel_l2, prefix: str = "",
                            write_fn=None, note: Optional[str] = None,
                            verbose: bool = True) -> bool:
    """Overwrite a persisted benchmark theta ONLY on improvement.

    The accuracy pins (tests/test_accuracy_pin.py and friends) re-score
    the ``benchmarks/results/theta_*.npz`` files; a benchmark re-run that
    lands under some fixed threshold but ABOVE the currently-pinned error
    must therefore never clobber the file (measured trap, CLAUDE.md: a
    tiny CPU smoke of a benchmark CLI once overwrote a pinned theta).

    The comparison score lives in a ``<path>.score.json`` sidecar written
    alongside every persist.  Decision table:

    - no existing file            -> write + sidecar, return True
    - sidecar says worse or equal -> skip, return False
    - sidecar says better         -> write + update sidecar, return True
    - existing file, NO sidecar   -> SKIP (legacy pin of unknown score;
      refusing is the only choice that cannot break a pin) unless the
      operator sets ``VARNET_FORCE_THETA=1``.

    ``rel_l2`` must be the score the WRITTEN parameters re-score to (the
    final iterate), not a history best that may not be reproducible.
    ``write_fn(path)`` overrides the default ``save_theta_npz`` for
    multi-net payloads.
    """
    path = os.fspath(path)
    side = path + ".score.json"
    rel_l2 = float(rel_l2)
    force = os.environ.get("VARNET_FORCE_THETA", "0") == "1"
    if os.path.exists(path) and not force:
        if not os.path.exists(side):
            if verbose:
                print(f"[persist_theta] REFUSING to overwrite {path}: no "
                      f"score sidecar (legacy pin of unknown quality); "
                      f"new score {rel_l2:.3e} recorded nowhere — set "
                      f"VARNET_FORCE_THETA=1 to force", flush=True)
            return False
        old = json.loads(open(side).read()).get("rel_l2")
        if old is not None and rel_l2 >= float(old):
            if verbose:
                print(f"[persist_theta] keeping {os.path.basename(path)}: "
                      f"pinned {float(old):.3e} <= new {rel_l2:.3e}",
                      flush=True)
            return False
    if write_fn is None:
        write_fn = lambda p: save_theta_npz(p, theta, prefix)  # noqa: E731
    write_fn(path)
    rec = {"rel_l2": rel_l2, "date": time.strftime("%Y-%m-%d")}
    if note:
        rec["note"] = note
    with open(side, "w") as f:
        json.dump(rec, f, indent=2)
    if verbose:
        print(f"[persist_theta] wrote {os.path.basename(path)} "
              f"(rel-L2 {rel_l2:.3e})", flush=True)
    return True


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
