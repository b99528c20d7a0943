"""The driver contract (__graft_entry__.py) stays runnable.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual CPU mesh at the END of every round —
a regression here would otherwise surface only in the round artifacts
(BENCH_r*.json / MULTICHIP_r*.json), hours after the breaking commit.
"""

import importlib.util
import os

import jax
import pytest


def _load():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert jax.numpy.isfinite(out), out


@pytest.mark.slow
def test_dryrun_multichip_small():
    """The full shard_map train + LM dry run on a 2-device mesh (the
    8-device variant is the driver's job; 2 keeps the 1-core suite
    fast while still exercising the sharded-vs-single comparison)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mod = _load()
    mod.dryrun_multichip(2)
