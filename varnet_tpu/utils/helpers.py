"""Shared helpers.

TPU-native re-implementation of the reference's utility layer
(reference: ``UtilityFunc.py``, class ``UF`` — SURVEY.md §2.1 #7; the
reference mount was empty so citations are to the survey's behavioral
spec rather than file:line).
"""

from __future__ import annotations

import contextlib
import os

import numpy as np


@contextlib.contextmanager
def matmul_precision_scope(value):
    """Scoped ``jax_default_matmul_precision`` override.

    The TPU MXU multiplies f32 as bf16 by default (~5e-3 noise floor —
    BASELINE.md); the <1e-3 accuracy phases run under 'highest'.  The
    override MUST be scoped: two VarNet instances in one process would
    otherwise contaminate each other's precision (ADVICE r1).  ``None``
    is a no-op.
    """
    if value is None:
        yield
        return
    import jax

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", value)
    try:
        yield
    finally:
        # Restore prev VERBATIM (None is legal): rewriting None to
        # 'default' changes the jit trace context and silently invalidates
        # every previously-traced jit cache entry (measured: 1 -> 2 traces)
        # — minutes of recompilation for the big TPU train step.
        jax.config.update("jax_default_matmul_precision", prev)


def enable_compilation_cache(path: str = "~/.cache/varnet_tpu_xla") -> bool:
    """Turn on JAX's persistent compilation cache (big train-step programs
    take minutes to compile on the TPU toolchain; cached reruns are
    instant).  Safe no-op on runtimes without support."""
    try:
        import jax

        p = os.path.expanduser(path)
        os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False


def is_none(x) -> bool:
    """None-tolerant emptiness check (reference UF.isnone equivalent)."""
    return x is None


def is_empty(x) -> bool:
    """True for None, empty sequences, and zero-size arrays."""
    if x is None:
        return True
    if isinstance(x, np.ndarray):
        return x.size == 0
    try:
        return len(x) == 0
    except TypeError:
        return False


def vstack(arrays):
    """None-tolerant vstack (reference UF.vstack equivalent)."""
    arrays = [np.atleast_2d(a) for a in arrays if not is_empty(a)]
    if not arrays:
        return None
    return np.vstack(arrays)


def hstack(arrays):
    """None-tolerant hstack (reference UF.hstack equivalent)."""
    arrays = [a for a in arrays if not is_empty(a)]
    if not arrays:
        return None
    return np.hstack(arrays)


def pair_mats(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cartesian pairing of two point sets (reference UF.pairMats).

    Given ``a`` of shape [Na, da] and ``b`` of shape [Nb, db], returns the
    [Na * Nb, da + db] array of all row pairs, with ``b`` varying slowest:
    row (j * Na + i) = concat(a[i], b[j]).  Used to pair a spatial grid with
    a time grid (space-time training points) and with MOR parameter samples.
    """
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError("pair_mats expects 2-D arrays")
    na, nb = a.shape[0], b.shape[0]
    a_rep = np.tile(a, (nb, 1))
    b_rep = np.repeat(b, na, axis=0)
    return np.hstack([a_rep, b_rep])


def rel_l2_error(pred, true, eps: float = 1e-30) -> float:
    """Relative L2 error ||pred - true|| / ||true|| (reference UF error norm)."""
    pred = np.asarray(pred, dtype=np.float64).ravel()
    true = np.asarray(true, dtype=np.float64).ravel()
    denom = np.linalg.norm(true)
    return float(np.linalg.norm(pred - true) / (denom + eps))


def cartesian_grid(lows, highs, counts):
    """Uniform tensor-product grid.

    Returns (nodes [prod(counts), dim], axes list of 1-D arrays, spacing [dim]).
    ``counts`` are node counts per dimension (>= 2).
    """
    lows = np.atleast_1d(np.asarray(lows, dtype=np.float64))
    highs = np.atleast_1d(np.asarray(highs, dtype=np.float64))
    counts = np.atleast_1d(np.asarray(counts, dtype=np.int64))
    axes = [np.linspace(lo, hi, int(n)) for lo, hi, n in zip(lows, highs, counts)]
    spacing = (highs - lows) / (counts - 1)
    mesh = np.meshgrid(*axes, indexing="ij")
    nodes = np.stack([m.ravel() for m in mesh], axis=-1)
    return nodes, axes, spacing
