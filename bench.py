"""Driver benchmark: quad-point residual throughput on the flagship config.

Runs the full jitted training step (forward + input-jacobian at every
quadrature point, weak-form residual contraction, backward, Adam) of the
flagship 2-D time-dependent AD-PDE (BASELINE.json config 4 analytic
variant) on the available accelerator and prints ONE JSON line:

    {"metric": "quad_evals_per_sec", "value": N, "unit": "...",
     "vs_baseline": N / <torch-CPU stand-in baseline>}

The baseline denominator is the measured torch-CPU stand-in
(benchmarks/baseline.json, produced by benchmarks/baseline_torch.py —
see BASELINE.md for why it is measured, not cited).
"""

import json
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))

DISC = int(os.environ.get("BENCH_DISC", 48))
TDISC = int(os.environ.get("BENCH_TDISC", 32))
WIDTH = int(os.environ.get("BENCH_WIDTH", 20))
# 200-epoch timing window: the first ~30 steps carry a warm-up transient
# (dispatch-queue fill on the tunnel + program warmup) that under-measures
# the tile-8192 directional kernel by ~30% (measured 7.6e8 at 30 epochs vs
# a steady-state 1.13e9 at 200).
EPOCHS = int(os.environ.get("BENCH_EPOCHS", 200))
# Quadrature points per kernel program (0 = kernel auto; see
# ops/pallas_residual.py q_block)
QBLOCK = int(os.environ.get("BENCH_QBLOCK", 0)) or None
# Experimental kernel variants (ops/pallas_residual.py): precomputed
# coefficients and sublane-aligned q-blocking
PRECOEFF = os.environ.get("BENCH_PRECOEFF", "0") == "1"
SUBLANE = os.environ.get("BENCH_SUBLANE", "0") == "1"
# Fourier-feature trial net (BENCH_FOURIER = n_feat, 0 = plain MLP):
# measures the FF directional kernel (the contaminant flagship's net
# shape; scale fixed at the measured multi-scale recipe)
FOURIER = int(os.environ.get("BENCH_FOURIER", 0))
# BENCH_NO_FUSED=1 disables the fused-residual kernel (A/B: the
# value+jac kernel + XLA contraction path the config would otherwise
# auto-select past)
NO_FUSED = os.environ.get("BENCH_NO_FUSED", "0") == "1"


def main():
    # Fail FAST and legibly when the TPU tunnel is wedged (measured
    # round 5: the axon device can stop answering and a client then
    # futex-waits forever — an un-guarded bench would hang instead of
    # reporting).  The probe runs in a subprocess so its hang cannot
    # wedge THIS process.
    import subprocess

    # Preempt any queue step FIRST (host-side SIGTERM + bench lock —
    # varnet_tpu/utils/preempt.py); probing while a step holds the chip
    # would block and misread "busy" as "wedged".  The atexit hook
    # releases the lock if we exit on probe failure.
    from varnet_tpu.utils.preempt import preempt_queue_step

    preempt_queue_step()

    probe_ok = True
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; x = jax.numpy.ones((128, 128));"
                 "assert jax.devices()[0].platform == 'axon';"
                 "print(float(jax.device_get((x @ x).sum())))"],
                capture_output=True, timeout=240,
            )
            probe_ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            probe_ok = False
    if not probe_ok:
        print(json.dumps({
            "metric": "quad_evals_per_sec", "value": 0.0,
            "unit": "quad-point residual evals/s/chip",
            "vs_baseline": 0.0,
            "error": "TPU tunnel unreachable (240 s probe failed; "
                     "wedge documented in CLAUDE.md round-5 notes). "
                     "Last measured: 1.565e9 = 5142x (BENCH_r04).",
        }))
        return

    import jax
    import jax.numpy as jnp

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import transient_ad_2d
    from varnet_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    case = transient_ad_2d()
    ff_kwargs = {}
    if FOURIER:
        ff_kwargs = dict(fourier_features=FOURIER, fourier_scale=(0.5, 2.0))
    vn = VarNet(
        case["pde"],
        layer_width=(WIDTH, WIDTH),
        disc_num=DISC,
        b_disc_num=DISC,
        t_disc_num=TDISC,
        fused_q_block=QBLOCK,
        fused_precoeff=PRECOEFF,
        fused_sublane_pad=SUBLANE,
        use_fused_residual=not NO_FUSED,
        **ff_kwargs,
    )
    n_chips = vn.n_shards
    # The TPU tunnel occasionally drops a session mid-run (measured:
    # UNAVAILABLE device errors — DESIGN.md decision 10); the bench is
    # cheap, so retry transient faults rather than losing the round's
    # driver measurement to one flake.
    res = vn.train(
        epoch_num=EPOCHS,
        weight=(1.0, 10.0, 10.0),
        save_freq=EPOCHS,
        verbose=False,
        max_retries=2,
        retry_backoff=60.0,
    )
    per_chip = res.quad_evals_per_sec / max(n_chips, 1)

    baseline = None
    bl_path = HERE / "benchmarks" / "baseline.json"
    if bl_path.exists():
        with open(bl_path) as f:
            baseline = json.load(f).get("value")

    out = {
        "metric": "quad_evals_per_sec",
        "value": per_chip,
        "unit": "quad-pt residual evals/s/chip (fwd+bwd+adam)",
        "vs_baseline": (per_chip / baseline) if baseline else None,
        "n_chips": n_chips,
        "n_test": vn.static.n_test,
        "n_quad_per_test": vn.static.n_quad_per_test,
        "steps_per_sec": res.steps_per_sec,
        "final_loss": res.losses[-1]["loss"] if res.losses else None,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0].device_kind),
        "fourier_features": FOURIER or None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
