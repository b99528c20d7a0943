"""Transient device-fault classification (SURVEY.md §5.3).

The reference has no failure-detection subsystem; its recovery story —
and ours — is checkpoint-restart (SURVEY.md §5.3/§5.4).  This module
supplies the one piece the reference never needed: deciding whether a
runtime error from the accelerator is *transient* (worth an in-process
retry from the last checkpoint) or a genuine program error (propagate).

Measured motivation: three separate LM refinements on the large
width-96/ff128 program died to ``UNAVAILABLE: TPU device error`` at LM
start (HBM pressure through the device tunnel).  The cure in every case
was "resume from the persisted theta with a larger ``k_chunks``" —
mechanical enough to belong in the library, not in every driver script.
"""

from __future__ import annotations

# XLA/PJRT status codes that indicate infrastructure trouble rather
# than a bug in the traced program.
TRANSIENT_STATUS_CODES = (
    "UNAVAILABLE",
    "ABORTED",
    "DEADLINE_EXCEEDED",
    "INTERNAL",
    # measured on this machine: a device_get through the TPU tunnel once
    # died to a transient FAILED_PRECONDITION (CLAUDE.md known traps)
    "FAILED_PRECONDITION",
)

# RESOURCE_EXHAUSTED (OOM) is deterministic for an unchanged program, so
# it is only retryable when the caller shrinks the memory footprint
# between attempts (refine_lm's k_chunks escalation does; train's retry
# re-launches the identical program and must not spin on it).
OOM_STATUS_CODES = ("RESOURCE_EXHAUSTED",)


def is_transient_device_error(
    err: BaseException, include_oom: bool = False
) -> bool:
    """True if ``err`` looks like a transient accelerator fault.

    JAX surfaces PJRT failures as ``jax.errors.JaxRuntimeError`` whose
    message leads with the gRPC-style status code; match on those rather
    than exception identity so the classification survives jaxlib
    version drift.  ``include_oom`` adds RESOURCE_EXHAUSTED — pass True
    only when the retry will shrink the program's memory footprint
    (the default is False to match that contract: retrying an identical
    program on a deterministic OOM just spins).
    """
    import jax

    if not isinstance(err, jax.errors.JaxRuntimeError):
        return False
    msg = str(err)
    if "Mosaic" in msg:
        # Mosaic/Pallas lowering failures surface as INTERNAL but are
        # deterministic compiler errors — retrying re-pays the multi-
        # minute compile for the same failure.
        return False
    codes = TRANSIENT_STATUS_CODES + (OOM_STATUS_CODES if include_oom else ())
    return any(code in msg for code in codes)
