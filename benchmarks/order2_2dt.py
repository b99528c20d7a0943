"""Order-2 vs order-1 test space on the 2-D transient family (CPU study).

Companion to benchmarks/order2_floor.py (the TPU flagship runner) and the
1-D measurement in tests/test_quadratic.py / DESIGN.md decision 9.  This
one answers a cheaper question on CPU: at a SMALL matched budget (same
net, same Adam epochs, same LM iterations, same mesh), does the quadratic
test space already pay on 2-Dt, or is the run optimization-bound there?

Measured 2026-08-18 (results/order2_2dt_cpu.json): order 1 reaches
1.40e-2 in 117 s; order 2 reaches 1.18e-2 in 1576 s — a 16% error drop
for 13.5x wall (K grows 245 -> 2475: bubbles add nodes in every dim
including time).  Conclusion: at coarse meshes the 2-Dt family is
optimization-bound, not test-space-bound; order 2's 8x floor advantage
(1-D steady, DESIGN.md 9) only matters once Adam+LM saturate the order-1
floor, i.e. at flagship budgets (benchmarks/order2_floor.py measures
that regime on TPU).

Run:  python -u benchmarks/order2_2dt.py
"""

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402

RESULTS = Path(__file__).parent / "results"


def main():
    case = transient_ad_2d()
    w = (1.0, 10.0, 10.0)
    out = {}
    for order in (1, 2):
        t0 = time.perf_counter()
        vn = VarNet(case["pde"], layer_width=(24, 24), disc_num=8,
                    t_disc_num=6, b_disc_num=8, n_devices=1,
                    test_order=order)
        vn.train(epoch_num=2500, weight=w, save_freq=2500, verbose=False)
        r = vn.refine_lm(steps=30, weight=w, save_freq=10, cg_iters=50,
                         verbose=True, matmul_precision=None)
        out[f"order{order}"] = {
            "best_rel_l2": r.best_error(),
            "wall_s": time.perf_counter() - t0,
            "K": vn.static.n_test,
            "nq": vn.static.n_quad_per_test,
        }
        print(json.dumps(out[f"order{order}"]), flush=True)
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "order2_2dt_cpu.json").write_text(json.dumps(out, indent=2))
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
