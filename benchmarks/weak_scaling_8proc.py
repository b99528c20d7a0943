"""n=8 sustained-loop weak-scaling row via 8 PROCESSES x 1 device each
(VERDICT r4 item 5).

The in-process 8-virtual-device mesh deadlocks on sustained training
loops on this one-core box (weak_scaling.py header: the shared CPU
executor starves the 8-participant rendezvous).  Eight SEPARATE
single-device processes each own an executor and talk through the
jax.distributed runtime instead, so the same 8-way one-psum train step
can run a sustained timing loop (tests/test_distributed.py
test_eight_process_distributed_train_step is the correctness half of
this evidence; this script is the throughput half).

Same regime as weak_scaling.py: mesh (8, 48), width (32, 32), 50 warmup
+ 600 timed epochs, synchronous dispatch.  Writes the row into
weak_scaling.json under rows["8_process"] and recomputes eta_serial
against the recorded n=1 row.

Run (CPU, ~minutes): python benchmarks/weak_scaling_8proc.py
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

RESULTS = Path(__file__).resolve().parent / "results"
REPO = str(Path(__file__).resolve().parent.parent)

NPROC = 8
DISC, TDISC = 8, 48  # weak_scaling.MESHES[8]
EPOCHS = 600
WARMUP = 50

_CHILD = textwrap.dedent(
    f"""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1")
    os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    sys.path.insert(0, {REPO!r})
    from varnet_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=f"localhost:{{port}}",
                           num_processes={NPROC}, process_id=pid)
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import transient_ad_2d
    case = transient_ad_2d()
    vn = VarNet(case["pde"], layer_width=(32, 32), disc_num={DISC},
                t_disc_num={TDISC}, b_disc_num={DISC}, n_devices={NPROC},
                seed=0)
    vn.train(epoch_num={WARMUP}, weight=(1.0, 10.0, 10.0),
             save_freq={WARMUP}, verbose=False)
    t0 = time.perf_counter()
    vn.train(epoch_num={EPOCHS}, weight=(1.0, 10.0, 10.0),
             save_freq={EPOCHS}, verbose=False)
    wall = time.perf_counter() - t0
    if pid == 0:
        import json as _json
        print("ROW " + _json.dumps({{
            "disc": {DISC}, "tdisc": {TDISC},
            "n_test": int(vn.static.n_test),
            "steps_per_s": {EPOCHS} / wall, "wall_s": wall,
            "mode": "8 processes x 1 device (jax.distributed)"}}),
            flush=True)
    """
)


def main() -> None:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    child = Path("/tmp/weak8_child.py")
    child.write_text(_CHILD)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, "-u", str(child),
                               str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              env=env)
             for pid in range(NPROC)]
    row = None
    failed = False
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=3600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, failed = "(timeout)", True
        if p.returncode not in (0, None) or failed:
            failed = True
            print(f"[weak8] child {pid} rc={p.returncode}:\n{out[-1500:]}",
                  flush=True)
        for line in out.splitlines():
            if line.startswith("ROW "):
                row = json.loads(line[4:])
    if row is None:
        row = {"disc": DISC, "tdisc": TDISC, "deadlocked": True,
               "mode": "8 processes x 1 device (jax.distributed)"}
    path = RESULTS / "weak_scaling.json"
    out = json.loads(path.read_text()) if path.exists() else {"rows": {}}
    one = out.get("rows", {}).get("1")
    if one and "n_test" in row:
        work = row["n_test"] / one["n_test"]
        row["eta_vs_t1"] = one["wall_s"] / row["wall_s"]
        row["eta_serial"] = (one["wall_s"] * work) / row["wall_s"]
    out.setdefault("rows", {})["8_process"] = row
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(row, indent=2), flush=True)


if __name__ == "__main__":
    main()
