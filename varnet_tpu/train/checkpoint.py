"""Checkpoint / resume.

TPU-native re-implementation of the reference's persistence path
(reference: ``tf.train.Saver`` checkpoints every ``saveFreq`` epochs inside
``VarNet.train`` + ``VarNet.loadModel`` graph-rebuild-and-restore —
SURVEY.md §3.4, §5.4): Orbax stores (params, opt_state, step) and a JSON
sidecar records the problem/discretization config so ``load`` can verify
the rebuilt problem is compatible — the fixed data itself is regenerated
deterministically from the config, exactly as the reference regenerates it
from ctor args, so checkpoints stay small.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import warnings

import jax
import numpy as np
import orbax.checkpoint as ocp

# Orbax/tensorstore surface structure mismatches through their own
# exception types on some versions; treat those like ValueError for the
# params-only fallback (ADVICE r2).  Resolved defensively: the module
# layout has moved across orbax releases.
_OCP_STRUCT_ERRORS: tuple = ()
for _name in ("CheckpointError", "StructureError"):
    _exc = getattr(getattr(ocp, "errors", ocp), _name, None)
    if isinstance(_exc, type) and issubclass(_exc, Exception):
        _OCP_STRUCT_ERRORS += (_exc,)


def _step_dir(folder: str, step: int) -> str:
    return os.path.join(os.path.abspath(folder), f"ckpt_{step:010d}")


def save_checkpoint(
    folder: str,
    step: int,
    state: Dict[str, Any],
    config: Optional[Dict[str, Any]] = None,
    keep: int = 3,
) -> str:
    """Write checkpoint ``ckpt_<step>`` under ``folder``; prune old ones."""
    folder = os.path.abspath(folder)
    os.makedirs(folder, exist_ok=True)
    path = _step_dir(folder, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    if config is not None:
        with open(os.path.join(folder, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=_json_default)
    # Prune: keep the newest ``keep`` checkpoints (and their meta sidecars).
    steps = sorted(list_checkpoint_steps(folder))
    for old in steps[:-keep]:
        shutil.rmtree(_step_dir(folder, old), ignore_errors=True)
        meta = _step_dir(folder, old) + ".meta.json"
        if os.path.exists(meta):
            os.remove(meta)
    return path


def list_checkpoint_steps(folder: str):
    folder = os.path.abspath(folder)
    if not os.path.isdir(folder):
        return []
    steps = []
    for name in os.listdir(folder):
        if name.startswith("ckpt_") and os.path.isdir(os.path.join(folder, name)):
            try:
                steps.append(int(name[len("ckpt_"):]))
            except ValueError:
                pass
    return sorted(steps)


def load_checkpoint(
    folder: str,
    target: Dict[str, Any],
    step: Optional[int] = None,
) -> Tuple[Dict[str, Any], int]:
    """Restore the latest (or given-step) checkpoint into ``target``'s
    structure.  Returns (state, step).

    If the stored optimizer state's structure does not match the target's
    (e.g. polishing a checkpoint written with a different optimizer /
    schedule), falls back to restoring the parameters alone — exactly the
    reference's semantics of rebuilding the graph and restoring weights.
    """
    steps = list_checkpoint_steps(folder)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {folder}")
    step = steps[-1] if step is None else int(step)
    if step not in steps:
        raise FileNotFoundError(f"no checkpoint for step {step} under {folder}")
    path = _step_dir(folder, step)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        try:
            state = ckptr.restore(path, abstract)
        except (ValueError, KeyError, TypeError) + _OCP_STRUCT_ERRORS as struct_err:
            # Structure mismatch (e.g. polishing a checkpoint written with a
            # different optimizer/schedule): fall back to params-only restore
            # — the reference's rebuild-graph-and-restore-weights semantics.
            # Anything else (corrupt/unreadable checkpoint) propagates.
            theta_only = {"theta": abstract["theta"]}
            try:
                with ocp.PyTreeCheckpointer() as pck:
                    restored = pck.restore(
                        path,
                        args=ocp.args.PyTreeRestore(
                            item=theta_only, partial_restore=True
                        ),
                    )
            except Exception:
                raise struct_err
            warnings.warn(
                "stored optimizer state does not match the target structure "
                f"({type(struct_err).__name__}); restored parameters only, "
                "optimizer state is fresh",
                stacklevel=2,
            )
            state = dict(target)
            state["theta"] = restored["theta"]
    return state, step


def save_meta(folder: str, step: int, meta: Dict[str, Any]) -> str:
    """Small JSON sidecar per checkpoint step (PRNG key, schedule step —
    SURVEY.md §5.4 asks for '(params, opt_state, step, PRNG key)'; the key
    lives here so the Orbax tree layout stays unchanged)."""
    p = _step_dir(folder, step) + ".meta.json"
    with open(p, "w") as f:
        json.dump(meta, f, default=_json_default)
    return p


def load_meta(folder: str, step: int) -> Optional[Dict[str, Any]]:
    p = _step_dir(folder, step) + ".meta.json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_config(folder: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(os.path.abspath(folder), "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")
