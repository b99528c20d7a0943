"""Test config: run JAX on CPU with 8 virtual devices.

This is the TPU-world "fake backend" the reference never had (SURVEY.md
§4): sharding-equivalence tests assert sharded-vs-replicated losses and
gradients agree on an 8-device host-platform mesh, without a pod.
Environment must be set before the first ``import jax`` anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
