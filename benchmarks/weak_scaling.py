"""Weak-scaling table on the virtual CPU mesh (SURVEY.md §5.8; VERDICT
r3 item 10).

Fixed PER-SHARD work (the flagship-shaped 2-D transient interior), mesh
grown 1 -> 2 -> 4 -> 8 virtual devices: records steps/s and the weak-
scaling efficiency eta(n) = t(1) / t(n) (ideal 1.0 — same wall per step
as the problem and mesh grow together).

HONEST CAVEAT (recorded in the JSON): this is an
``xla_force_host_platform_device_count`` CPU mesh on ONE physical core —
the collectives are memcpy-level and all "devices" share the core, so
eta measures the sharding/collective OVERHEAD structure of the train
step (one packed psum — tests/test_single_collective.py), not ICI
bandwidth.  Real multi-chip hardware is not available in this
environment; the number to watch is that eta stays near the serial
limit 1/n x constant — i.e. total wall grows ~linearly with total work
and no super-linear collective/dispatch overhead appears as the mesh
widens.

Run (CPU, ~minutes): python benchmarks/weak_scaling.py
Writes benchmarks/results/weak_scaling.json.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 shard threads on ONE physical core: arrival skew at the packed psum
# can exceed XLA-CPU's default 40 s rendezvous TERMINATION timeout during
# the first post-compile execution (observed: n=8 killed with
# "Termination timeout ... of 40 seconds exceeded").  Slow is fine here;
# dying is not.
if "collective_call_terminate" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.api import VarNet  # noqa: E402
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402

RESULTS = Path(__file__).parent / "results"

# per-shard interior size held ~constant: disc scales with sqrt(n) in x
# and the time axis with the remaining factor, so n_test ~ n_devices.
# Base work sized so the n=8 TOTAL (~5k classes) stays at the scale the
# 1-core virtual mesh demonstrably executes: an 8-participant rendezvous
# with larger per-shard programs (measured at 16k and 36k total classes)
# starves past even a 1200 s termination timeout (only 4-7 of 8 thunks
# ever arrive) — 8 shard programs sharing ONE physical core's executor,
# an artifact of the virtual mesh, not of the sharding design (the same
# step at these sizes is the suite's everyday 8-device workload).
MESHES = {1: (8, 6), 2: (8, 12), 4: (16, 12), 8: (16, 24)}
EPOCHS = 600
WARMUP = 50


def main():
    case = transient_ad_2d()
    rows = {}
    t1 = None
    for n, (disc, tdisc) in MESHES.items():
        vn = VarNet(case["pde"], layer_width=(32, 32), disc_num=disc,
                    t_disc_num=tdisc, b_disc_num=disc, n_devices=n, seed=0)
        # warm the jit cache, then time steady-state epochs
        vn.train(epoch_num=WARMUP, weight=(1.0, 10.0, 10.0),
                 save_freq=WARMUP, verbose=False)
        t0 = time.perf_counter()
        vn.train(epoch_num=EPOCHS, weight=(1.0, 10.0, 10.0),
                 save_freq=EPOCHS, verbose=False)
        wall = time.perf_counter() - t0
        sps = EPOCHS / wall
        if n == 1:
            t1 = wall
        rows[str(n)] = {
            "disc": disc, "tdisc": tdisc, "n_test": vn.static.n_test,
            "steps_per_s": sps, "wall_s": wall,
            # ideal weak scaling on REAL hardware: eta = t(1)/t(n) = 1.
            # On the shared-core virtual mesh the serial limit is
            # t(n) ~ n x t(1) (all shards execute on one core), so we
            # also record eta_serial = (t(1) * work_ratio) / t(n): ~1
            # means no overhead beyond the arithmetic itself.
            "eta_vs_t1": t1 / wall,
        }
        print(f"[weak] n={n} disc={disc}x{tdisc} n_test="
              f"{vn.static.n_test}: {sps:.1f} steps/s", flush=True)
        # write incrementally: a late-n rendezvous failure on the shared
        # core must not lose the completed rows
        (RESULTS / "weak_scaling.json").write_text(
            json.dumps({"partial": True, "rows": rows}, indent=2))
    n_test1 = rows["1"]["n_test"]
    for n, row in rows.items():
        work = row["n_test"] / n_test1
        row["eta_serial"] = (t1 * work) / row["wall_s"]
    out = {
        "caveat": "virtual CPU mesh on one physical core, NOT ICI: "
                  "eta_serial ~ 1 means the widened mesh adds no "
                  "collective/dispatch overhead beyond the arithmetic; "
                  "eta_vs_t1 is the raw t(1)/t(n)",
        "network": "(32,32)", "epochs": EPOCHS,
        "rows": rows,
    }
    RESULTS.mkdir(exist_ok=True)
    (RESULTS / "weak_scaling.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
