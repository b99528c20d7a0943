"""Test config: run JAX on CPU with 8 virtual devices.

This is the TPU-world "fake backend" the reference never had (SURVEY.md
§4): sharding-equivalence tests assert sharded-vs-replicated losses and
gradients agree on an 8-device host-platform mesh, without a pod.
Environment must be set before the first ``import jax`` anywhere.
"""

import os

# Force CPU: the session environment may preset JAX_PLATFORMS (e.g. "axon"
# for the real-TPU tunnel), but unit tests must run on the 8-device virtual
# CPU mesh — fast, deterministic, no tunnel round-trips.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 shard threads share ONE physical core: arrival skew at a collective
# can exceed XLA-CPU's default 40 s rendezvous TERMINATION timeout on the
# first post-compile execution of a big step (measured: the weak-scaling
# n=8 run was hard-killed mid-psum).  Slow tests are fine; killed ones
# are not.
if "collective_call_terminate" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

# The axon sitecustomize (TPU-tunnel images) calls register(), which
# force-sets jax_platforms="axon,cpu" at interpreter start — AFTER env vars
# are read.  Override at the config level before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
