"""persist_theta_if_better: the improve-only sidecar guard protecting the
pinned benchmark thetas (CLAUDE.md trap: an unconditional save once let a
tiny CPU smoke clobber a pinned theta; the pins re-score persisted files,
so an overwrite with a worse-but-under-threshold theta breaks the suite).
"""

import json
import os

import numpy as np

from varnet_tpu.utils.io import load_theta_npz, persist_theta_if_better


def _theta(val):
    return [{"w": np.full((2, 3), val, np.float32),
             "b": np.zeros((3,), np.float32)}]


def test_first_write_creates_file_and_sidecar(tmp_path):
    p = tmp_path / "theta_x.npz"
    assert persist_theta_if_better(p, _theta(1.0), 1e-3, verbose=False)
    assert p.exists()
    side = json.loads((tmp_path / "theta_x.npz.score.json").read_text())
    assert side["rel_l2"] == 1e-3


def test_worse_score_refused(tmp_path):
    p = tmp_path / "theta_x.npz"
    persist_theta_if_better(p, _theta(1.0), 1e-3, verbose=False)
    assert not persist_theta_if_better(p, _theta(2.0), 5e-3, verbose=False)
    assert load_theta_npz(p)[0]["w"][0, 0] == 1.0  # original kept
    side = json.loads((tmp_path / "theta_x.npz.score.json").read_text())
    assert side["rel_l2"] == 1e-3
    # equal score also refuses (no churn on re-runs of the same recipe)
    assert not persist_theta_if_better(p, _theta(3.0), 1e-3, verbose=False)


def test_better_score_overwrites(tmp_path):
    p = tmp_path / "theta_x.npz"
    persist_theta_if_better(p, _theta(1.0), 1e-3, verbose=False)
    assert persist_theta_if_better(p, _theta(2.0), 1e-4, verbose=False)
    assert load_theta_npz(p)[0]["w"][0, 0] == 2.0
    side = json.loads((tmp_path / "theta_x.npz.score.json").read_text())
    assert side["rel_l2"] == 1e-4


def test_legacy_file_without_sidecar_refused(tmp_path, monkeypatch):
    """A pre-guard pinned theta of unknown score must never be replaced
    silently — only VARNET_FORCE_THETA=1 overrides."""
    from varnet_tpu.utils.io import save_theta_npz

    p = tmp_path / "theta_x.npz"
    save_theta_npz(p, _theta(1.0))  # legacy: no sidecar
    assert not persist_theta_if_better(p, _theta(2.0), 1e-9, verbose=False)
    assert load_theta_npz(p)[0]["w"][0, 0] == 1.0
    monkeypatch.setenv("VARNET_FORCE_THETA", "1")
    assert persist_theta_if_better(p, _theta(2.0), 1e-9, verbose=False)
    assert load_theta_npz(p)[0]["w"][0, 0] == 2.0


def test_custom_write_fn(tmp_path):
    """Multi-net payloads (inverse {net, src}) route through write_fn."""
    p = tmp_path / "theta_pair.npz"
    called = []
    assert persist_theta_if_better(
        p, None, 1e-3, verbose=False,
        write_fn=lambda pth: (called.append(pth),
                              np.savez(pth, a=np.zeros(2)))[-1])
    assert called and os.path.exists(p)
    assert json.loads((tmp_path / "theta_pair.npz.score.json")
                      .read_text())["rel_l2"] == 1e-3


def test_repo_pins_have_sidecars():
    """Every pinned theta in benchmarks/results/ carries a score sidecar
    (backfilled 2026-08-20 from the recorded re-scores) — EXCEPT the
    score-stamped flagship_theta_* files whose filenames are their scores
    and which are only ever written under new names, plus wobs300 (no
    recorded re-score; the guard refuses overwrites there, which is the
    safe behavior)."""
    results = os.path.join(os.path.dirname(__file__), "..",
                           "benchmarks", "results")
    missing = []
    for f in sorted(os.listdir(results)):
        if not f.endswith(".npz") or f.startswith("flagship_theta_"):
            continue
        if f == "theta_inverse_source_wobs300.npz":
            continue
        # explicitly-labeled NEGATIVE examples (adequacy_check.py): their
        # value is being wrong in a pinned way — no sidecar means the
        # improve-only guard refuses ALL overwrites, which is exactly right
        if "_ALIASED" in f:
            continue
        if not os.path.exists(os.path.join(results, f + ".score.json")):
            missing.append(f)
    assert not missing, f"pinned thetas without score sidecars: {missing}"
