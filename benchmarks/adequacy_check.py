"""Validate the residual-adequacy guard on the REAL round-3 failure
(VERDICT r3 item 2 'done' criterion): the obstacle ff128/w96 solution
that drove its interior loss 1000x down while rel-L2 rose to 88% must be
FLAGGED; the 1.52% contaminant-causal solution (same ff128/w96 family,
adequate mesh) must PASS.

Also persists the aliased obstacle theta into benchmarks/results/ as an
explicitly-labeled NEGATIVE example (theta_obstacle_ff_ALIASED.npz —
bypasses the improve-only guard on purpose: its value is being wrong in
a pinned, reproducible way) so tests/test_adequacy_pin.py can re-score
both sides of the guard forever, not just while /tmp survives.

Run (CPU, ~minutes): python benchmarks/adequacy_check.py
Writes benchmarks/results/adequacy_check.json.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import contaminant_transport_2d
    from varnet_tpu.utils.io import load_theta_npz, save_theta_npz

    from benchmarks.obstacle_validation import build_pde

    RESULTS = Path(__file__).parent / "results"
    out = {}

    # ---- the aliased obstacle solution (rel-L2 88%) ------------------- #
    neg_path = RESULTS / "theta_obstacle_ff_ALIASED.npz"
    vn = VarNet(build_pde(), layer_width=(96,) * 3, disc_num=(40, 20),
                t_disc_num=24, b_disc_num=40, n_devices=1, hard_bc=True,
                fourier_features=128, input_scaling=False,
                fourier_scale=[0.5, 2.0])
    if neg_path.exists():
        vn.theta = load_theta_npz(neg_path)
        src = str(neg_path)
    else:
        # first run: harvest the final LM iterate from the queue18 step's
        # /tmp checkpoints and persist it as the pinned negative example
        vn.load_model("/tmp/obstacle_ff/lm")
        net = vn.theta["net"] if isinstance(vn.theta, dict) else vn.theta
        save_theta_npz(neg_path, net)
        src = "/tmp/obstacle_ff/lm"
    r = vn.residual_adequacy(refine=2)
    r["theta"] = src
    r["known_rel_l2"] = 0.88
    out["obstacle_ff_aliased"] = r
    assert r["flagged"], "the 88% obstacle-ff solution must be flagged"

    # ---- the solved contaminant (rel-L2 1.52%) ------------------------ #
    case = contaminant_transport_2d()
    vc = VarNet(case["pde"], layer_width=(96, 96, 96), disc_num=64,
                b_disc_num=64, t_disc_num=40, n_devices=1, seed=0,
                input_scaling=False, fourier_features=128,
                fourier_scale=[0.5, 2.0])
    vc.theta = load_theta_npz(RESULTS / "theta_contaminant_causal.npz")
    rc = vc.residual_adequacy(refine=2)
    rc["theta"] = "theta_contaminant_causal.npz"
    rc["known_rel_l2"] = 0.0152
    out["contaminant_causal"] = rc
    assert not rc["flagged"], "the 1.52% contaminant solution must pass"

    (RESULTS / "adequacy_check.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
