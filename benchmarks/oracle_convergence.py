"""Richardson mesh-convergence study of the CN-FDM oracle ON the obstacle
geometry (VERDICT r3 missing #2 / next-round item 3).

The obstacle push (benchmarks/obstacle_validation.py) scores the network
against the in-repo CN-FDM field at 160x80x400 — the solver is verified
2nd-order on manufactured solutions including a hole case
(tests/test_holes.py), but at exactly the geometry where the method is
struggling the FDM field itself was the sole, unchecked oracle.  This
study bounds the oracle's own error there: solve the SAME obstacle
config at three space-time resolutions (each doubling nx, ny, nt), take
rel-L2 differences on the shared coarse nodes, and Richardson-extrapolate

    order p        = log2(e01 / e12)
    err(L1 field)  ~ e12 / (1 - 2^-p)   (the 160x80x400 scoring field)
    err(L2 field)  ~ e12 / (2^p  - 1)

where e01 = relL2(L0, L1), e12 = relL2(L1, L2) over in-domain nodes at
the scoring sample times (t > 0).  Grid lines align with the rod at all
three levels (nx multiple of 20), so the hole Dirichlet rows stay
second-order.

Run (CPU, ~minutes): python benchmarks/oracle_convergence.py
Appends an "oracle" entry to benchmarks/results/obstacle_validation.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.obstacle_validation import build_pde  # noqa: E402

RESULTS = Path(__file__).parent / "results"

LEVELS = [(80, 40, 200), (160, 80, 400), (320, 160, 800),
          (640, 320, 1600)]
SAMPLE_TIMES = np.linspace(0.0, 1.0, 6)


def restrict(u_fine, shape_fine, factor):
    """Restrict a [S, N_fine] snapshot stack to the coarse subgrid (node
    (i, j) on the coarse grid is node (factor*i, factor*j) on the fine)."""
    nxn_f, nyn_f = shape_fine
    u = u_fine.reshape(u_fine.shape[0], nxn_f, nyn_f)
    return u[:, ::factor, ::factor].reshape(u_fine.shape[0], -1)


def rel_l2(a, b, mask):
    """Combined rel-L2 over t>0 snapshots restricted to in-domain nodes."""
    num = den = 0.0
    for s, ts in enumerate(SAMPLE_TIMES):
        if ts <= 0.0:
            continue
        num += float(np.sum((a[s][mask] - b[s][mask]) ** 2))
        den += float(np.sum(b[s][mask] ** 2))
    return float(np.sqrt(num / max(den, 1e-30)))


def main():
    from varnet_tpu.problems.classical import solve_ad_fdm_2d

    pde = build_pde()
    fields = []
    for nx, ny, nt in LEVELS:
        t0 = time.perf_counter()
        ref = solve_ad_fdm_2d(pde, nx=nx, ny=ny, nt=nt,
                              sample_times=SAMPLE_TIMES)
        wall = time.perf_counter() - t0
        print(f"[oracle] {nx}x{ny}x{nt}: {wall:.1f}s  "
              f"max|u|={np.abs(ref['u']).max():.4f}", flush=True)
        fields.append(ref)

    # everything is compared on the COARSEST grid's in-domain nodes
    mask0 = pde.domain.in_domain(fields[0]["x"])
    on0 = [restrict(f["u"], f["shape"], 2**i)
           for i, f in enumerate(fields)]
    diffs = [rel_l2(on0[i], on0[i + 1], mask0)
             for i in range(len(on0) - 1)]
    orders = [float(np.log2(diffs[i] / diffs[i + 1]))
              for i in range(len(diffs) - 1)]
    p = orders[-1]  # the finest pair's rate is closest to asymptotic
    # err of level i (vs exact) ~ diffs[i] / (1 - 2^-p) for i < last;
    # the scoring field is LEVELS[1]
    e12 = diffs[1]
    err_l1 = e12 / (1.0 - 2.0 ** (-p))
    err_l2 = diffs[-1] / (1.0 - 2.0 ** (-p))

    # per-time breakdown of the scoring field's estimated error (the
    # early-time plume is the sharpest feature — check it isn't hiding a
    # much larger local error than the combined number suggests)
    per_time = {}
    u1_on0, u2_on0 = on0[1], on0[2]
    for s, ts in enumerate(SAMPLE_TIMES):
        if ts <= 0.0:
            continue
        d = float(np.linalg.norm(u1_on0[s][mask0] - u2_on0[s][mask0])
                  / max(np.linalg.norm(u2_on0[s][mask0]), 1e-30))
        per_time[f"{ts:.2f}"] = d / (1.0 - 2.0 ** (-p))

    row = {
        "mode": "oracle",
        "levels": [f"{nx}x{ny}x{nt}" for nx, ny, nt in LEVELS],
        "successive_rel_l2": diffs,
        "observed_orders": orders,
        "est_err_160x80x400": err_l1,
        f"est_err_{LEVELS[-1][0]}x{LEVELS[-1][1]}x{LEVELS[-1][2]}": err_l2,
        "est_err_160_per_time": per_time,
        "note": "Richardson study of the CN-FDM scoring oracle on the "
                "obstacle geometry; est_err_160x80x400 bounds the "
                "oracle's contribution to every obstacle rel-L2 row",
    }
    RESULTS.mkdir(exist_ok=True)
    path = RESULTS / "obstacle_validation.json"
    rows = json.loads(path.read_text()) if path.exists() else []
    rows = [r for r in rows if r.get("mode") != "oracle"] + [row]
    path.write_text(json.dumps(rows, indent=2))
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
