"""Shared scoring of a trained VarNet against the in-repo CN-FDM
contaminant reference field (``benchmarks/data/contaminant_fdm.npz``).

One implementation for every script that writes or pins these numbers,
so the metric definition cannot drift between the benchmark that records
a JSON and the test that enforces it.  t=0 slices are excluded from BOTH
the per-time and overall metrics (ADVICE r2 consistency rule: the zero-IC
configs have both fields ~0 there, which flatters the headline).
"""

import numpy as np

from varnet_tpu.utils.helpers import rel_l2_error


def score_vs_fdm(vn, z, theta=None):
    """Returns ``(overall_rel_l2, per_time, max_abs_u_net)`` of
    ``vn.evaluate`` against the FDM npz ``z`` (keys x/times/u)."""
    x = z["x"].astype(np.float64)
    preds, trues, per_time = [], [], {}
    for s, tval in enumerate(z["times"]):
        if tval <= 0:
            continue
        u_net = vn.evaluate(x, t=np.full(x.shape[0], tval), theta=theta)
        u_fdm = z["u"][s].astype(np.float64)
        preds.append(u_net)
        trues.append(u_fdm)
        per_time[f"t={tval:.3f}"] = rel_l2_error(u_net, u_fdm)
    overall = rel_l2_error(np.concatenate(preds), np.concatenate(trues))
    return overall, per_time, float(max(np.abs(p).max() for p in preds))
