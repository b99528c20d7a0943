"""Every example CLI must run end-to-end on a tiny budget.

The reference's examples double as its only tests (SURVEY.md §2.1 #8);
here they are themselves under test.
"""

import pytest

from varnet_tpu.examples import (
    ad1d_steady,
    ad3d_prism,
    obstacle_2d,
    burgers_1d,
    inverse_coeff,
    lshape_2d,
    ad1d_transient,
    ad2d_steady,
    ad2d_transient,
    ad3d_steady,
    contaminant_2d,
    inverse_source,
    mor_1d,
    neumann_2d,
)

TINY = ["--epochs", "40", "--save-freq", "20", "--width", "8"]


@pytest.mark.parametrize(
    "mod,extra",
    [
        (ad1d_steady, ["--disc", "12"]),
        (ad1d_transient, ["--disc", "10", "--tdisc", "5"]),
        (ad1d_transient, ["--disc", "10", "--tdisc", "5", "--hard-bc"]),
        (lshape_2d, ["--disc", "10", "--hard-bc"]),
        (burgers_1d, ["--disc", "10", "--tdisc", "5"]),
        (burgers_1d, ["--disc", "12", "--steady"]),
        (inverse_coeff, ["--disc", "10", "--n-obs", "10"]),
        (inverse_coeff, ["--disc", "10", "--n-obs", "10", "--recover",
                         "vel"]),
        (ad2d_steady, ["--disc", "8"]),
        (ad2d_transient, ["--disc", "6", "--tdisc", "4"]),
        (ad3d_steady, ["--disc", "5", "--bdisc", "3"]),
        (ad3d_prism, ["--disc", "5", "--bdisc", "3", "--hard-bc"]),
        (obstacle_2d, ["--disc", "10", "--hard-bc"]),
        (neumann_2d, ["--disc", "8"]),
        (contaminant_2d, ["--disc", "6", "--tdisc", "4"]),
        (inverse_source, ["--disc", "8", "--n-obs", "36"]),
        (mor_1d, ["--disc", "10", "--vels", "0.5,1.0"]),
        (lshape_2d, ["--disc", "10"]),
    ],
    ids=lambda m: getattr(m, "__name__", str(m)).split(".")[-1],
)
def test_example_runs(mod, extra):
    vn = mod.main(TINY + extra)
    assert vn.train_result is not None
    assert len(vn.train_result.losses) >= 1


def test_example_folder_artifacts(tmp_path):
    """--folder/--plot/--resume produce their artifacts (VERDICT r2 weak
    #6): checkpoints + config + JSONL log + result summary + plots, and a
    resumed run restarts from the persisted epoch."""
    import os

    folder = str(tmp_path / "case")
    vn = ad1d_steady.main(
        TINY + ["--disc", "12", "--folder", folder, "--plot"]
    )
    names = set(os.listdir(folder))
    assert "config.json" in names
    assert "train_log.jsonl" in names
    assert "train_result.json" in names
    ckpts = [n for n in names if n.startswith("ckpt_") and not n.endswith(".json")]
    assert ckpts, f"no checkpoints in {sorted(names)}"
    pngs = [n for n in names if n.endswith(".png")]
    assert pngs, f"--plot produced no images in {sorted(names)}"
    with open(os.path.join(folder, "train_log.jsonl")) as f:
        lines = [line for line in f if line.strip()]
    assert lines, "empty train log"

    # Resume toward a LARGER total budget: picks up at the last
    # checkpointed epoch (40) and trains the remainder.
    vn2 = ad1d_steady.main(
        ["--epochs", "60", "--save-freq", "20", "--width", "8",
         "--disc", "12", "--folder", folder, "--resume"]
    )
    assert vn2.train_result is not None
    assert len(vn2.train_result.losses) >= 1
    assert vn2.train_result.epochs[-1] == 60

    # Resume with the budget already met: a no-op (global epoch
    # semantics — hang-recovery re-runs must not re-train).
    vn3 = ad1d_steady.main(
        ["--epochs", "60", "--save-freq", "20", "--width", "8",
         "--disc", "12", "--folder", folder, "--resume"]
    )
    assert vn3.train_result is not None
    assert vn3.train_result.losses == []


def test_example_ensemble_flag():
    """--ensemble E trains E members in one vmapped step and keeps the
    winner; --lm-precond polishes it with Jacobi-PCG (both beyond the
    reference — DESIGN.md decisions 13/14)."""
    vn = ad1d_steady.main(
        TINY + ["--disc", "12", "--ensemble", "2", "--lm-steps", "1",
                "--lm-cg", "5", "--lm-precond", "4"]
    )
    assert getattr(vn, "_ensemble_thetas", None) is not None
    import numpy as np

    u = vn.evaluate(np.linspace(0.1, 0.9, 5)[:, None])
    assert np.all(np.isfinite(u))


def test_contaminant_causal_cli():
    """--causal N drives train_causal with FF through the example CLI
    (the measured escape recipe for the volumetric-source variant)."""
    vn = contaminant_2d.main(
        TINY + ["--causal", "2", "--volumetric-source", "--ff", "8",
                "--disc", "6", "--tdisc", "4", "--bdisc", "6",
                "--layers", "1", "--devices", "1"])
    assert vn.t_disc_num == 4
    assert vn.fourier_b is not None
