"""Device mesh + sharding layout.

TPU-native replacement for the reference's multi-tower data parallelism
(reference: ``TFModel.py`` ``processors``/``controller`` tower replication
with in-graph gradient averaging — SURVEY.md §2.2): one
``jax.sharding.Mesh`` with a ``data`` axis over all chips; the
test-function axis of every fixed-data array is sharded over it, model
parameters are replicated, and XLA lowers the single gradient reduction to
an ICI all-reduce (SURVEY.md §5.8).  No other parallelism is structurally
required: weak-form residuals are local to each test-function support
(SURVEY.md §5.7), so tensor/pipeline/sequence/expert axes are documented
non-goals; the mesh keeps a trivial ``model`` axis so one could be added
without re-plumbing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bootstrap (SURVEY.md §5.8): ``jax.distributed.initialize``
    with env/TPU-pod autodetection when no args are given.  After this,
    ``make_mesh()`` spans every chip of every host and the single psum per
    step is lowered to ICI all-reduce intra-slice / DCN across slices.

    No-op (returns 1) in single-process settings so callers can invoke it
    unconditionally.
    """
    if num_processes is None and coordinator_address is None:
        import os

        if "COORDINATOR_ADDRESS" not in os.environ and not os.environ.get(
            "TPU_WORKER_HOSTNAMES", ""
        ).count(","):
            return 1  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A (data, model=1) mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    dev_array = np.asarray(devices).reshape(len(devices), 1)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (test-function / point) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batched_quad_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-reshaped [B, Kb, ...] arrays: the scan axis B is
    replicated, the per-test-function axis Kb shards over ``data``."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_quad(quad, mesh: Mesh, dtype=None, batched: bool = False):
    """Place QuadData: per-test-function arrays sharded on ``data``; the
    shared [nQ]-sized tables (N, dN, w) replicated — unless they are
    per-node tables (order-2 test space, ``quad.tables_per_node``), which
    shard with the node axis in BOTH layouts ([K, nQ] unbatched,
    [B, Kb, nQ] after the mini-batch reshape).  ``batched=True`` for
    [B, Kb, ...] arrays produced by that reshape (axis 1 shards)."""
    import jax.numpy as jnp

    dsh = batched_quad_sharding(mesh) if batched else data_sharding(mesh)
    rsh = replicated_sharding(mesh)
    tsh = dsh if quad.tables_per_node else rsh

    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if dtype is not None else a

    return type(quad)(
        coords=jax.device_put(cast(quad.coords), dsh),
        N=jax.device_put(cast(quad.N), tsh),
        dN=jax.device_put(cast(quad.dN), tsh),
        w=jax.device_put(cast(quad.w), tsh),
        kappa=jax.device_put(cast(quad.kappa), dsh),
        vel=jax.device_put(cast(quad.vel), dsh),
        src=jax.device_put(cast(quad.src), dsh),
        react=jax.device_put(cast(quad.react), dsh),
        mask=jax.device_put(cast(quad.mask), dsh),
    )


def shard_points(points, mesh: Mesh, dtype=None):
    """Place PointData: every array sharded on ``data`` along axis 0."""
    import jax.numpy as jnp

    dsh = data_sharding(mesh)

    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if dtype is not None else a

    return type(points)(
        coords=jax.device_put(cast(points.coords), dsh),
        values=jax.device_put(cast(points.values), dsh),
        mask=jax.device_put(cast(points.mask), dsh),
    )


def shard_flux(flux, mesh: Mesh, dtype=None):
    """Place FluxData (Neumann penalty rows): every array sharded on
    ``data`` along axis 0, like PointData."""
    import jax.numpy as jnp

    dsh = data_sharding(mesh)

    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if dtype is not None else a

    return type(flux)(
        coords=jax.device_put(cast(flux.coords), dsh),
        dirs=jax.device_put(cast(flux.dirs), dsh),
        values=jax.device_put(cast(flux.values), dsh),
        mask=jax.device_put(cast(flux.mask), dsh),
        alpha=jax.device_put(cast(flux.alpha), dsh),
    )


def shard_hard(hard, mesh: Mesh, dtype=None, batched: bool = False):
    """Place hard-BC transform tables (fem/hardbc.py): every array in the
    ``(HardQuad, HardPts-or-None, HardQuad-or-None)`` pytree (quad / obs /
    flux-penalty tables) carries a leading K/N axis and shards on ``data``
    (None leaves — steady At/Bt, absent obs/flux — pass through
    untouched).  ``batched=True`` when the QUAD tables were reshaped to
    the mini-batch layout [B, Kb, ...] (axis 1 shards, mirroring
    shard_quad); the obs/flux tables stay full-batch like their penalty
    rows."""
    import jax
    import jax.numpy as jnp

    hq, hpts, hflux = hard
    dsh = data_sharding(mesh)
    qsh = batched_quad_sharding(mesh) if batched else dsh

    def place(sh):
        def f(a):
            a = jnp.asarray(a)
            if dtype is not None:
                a = a.astype(dtype)
            return jax.device_put(a, sh)

        return f

    return (
        jax.tree_util.tree_map(place(qsh), hq),
        jax.tree_util.tree_map(place(dsh), hpts),
        jax.tree_util.tree_map(place(dsh), hflux),
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh, always COPYING: the result
    is donated into the train step, and a device_put that aliased the
    caller's buffer would delete the caller's arrays on donation."""
    import jax.numpy as jnp

    rsh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(jnp.array(leaf, copy=True), rsh), tree
    )
