"""Quick TPU regression smoke for the LM kernel plumbing.

Runs 2 LM iterations at the flagship shape (width 48 — below the
_auto_tile_lm wide-net cap, so the TPU-proven tile is unchanged) from
the pinned best theta and asserts the error stays at its recorded level,
then 2 LM iterations at 3-D width 64 (ABOVE the cap — the shape whose
uncapped tile OOM'd scoped VMEM, /tmp/tpu_queue3 ad3d_d16_deep) to prove
the capped kernels compile and run.  No results are overwritten.
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = os.path.join(os.path.dirname(__file__), "results")


def main():
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_3d, transient_ad_2d
    from varnet_tpu.utils.io import load_theta_npz

    # --- flagship width 48: proven recipe must stay working -------------
    case = transient_ad_2d()
    vn = VarNet(case["pde"], layer_width=(48, 48, 48), disc_num=48,
                t_disc_num=32)
    vn.theta = load_theta_npz(
        os.path.join(RESULTS, "flagship_theta_1.1e-04.npz")
    )
    err0 = vn.compute_error(vn.theta, disc=96, n_times=7)
    res = vn.refine_lm(steps=2, cg_iters=50, weight=(1.0, 50.0, 50.0),
                       save_freq=1, verbose=True, lam0=1e-9)
    errs = [e for e in res.errors if np.isfinite(e)]
    err1 = min(errs) if errs else float("nan")
    print(f"[lm-smoke] flagship w48: {err0:.3e} -> {err1:.3e}")
    assert np.isfinite(err1) and err1 < 2e-4, (err0, err1)

    # --- 3-D width 64: the shape that OOM'd before _auto_tile_lm --------
    case3 = steady_ad_3d()
    vn3 = VarNet(case3["pde"], layer_width=(64, 64, 64), disc_num=12)
    vn3.train(epoch_num=200, weight=(1.0, 10.0), save_freq=200,
              verbose=False)
    res3 = vn3.refine_lm(steps=2, cg_iters=30, weight=(1.0, 10.0),
                         save_freq=1, verbose=True)
    losses = [rec["loss"] for rec in res3.losses]
    print(f"[lm-smoke] 3-D w64 LM losses: {losses}")
    assert all(np.isfinite(v) for v in losses)
    print("[lm-smoke] PASS")


if __name__ == "__main__":
    main()
