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

# XLA/PJRT status codes that indicate infrastructure or capacity trouble
# rather than a bug in the traced program.  RESOURCE_EXHAUSTED (OOM) is
# included because the retry path shrinks the per-chunk footprint
# (k_chunks escalation) before re-trying.
TRANSIENT_STATUS_CODES = (
    "UNAVAILABLE",
    "ABORTED",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
    "INTERNAL",
)


def is_transient_device_error(err: BaseException) -> bool:
    """True if ``err`` looks like a transient accelerator fault.

    JAX surfaces PJRT failures as ``jax.errors.JaxRuntimeError`` whose
    message leads with the gRPC-style status code; match on those rather
    than exception identity so the classification survives jaxlib
    version drift.
    """
    import jax

    if not isinstance(err, jax.errors.JaxRuntimeError):
        return False
    msg = str(err)
    return any(code in msg for code in TRANSIENT_STATUS_CODES)
