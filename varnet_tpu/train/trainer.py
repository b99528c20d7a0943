"""Jitted, sharded training step + epoch loop.

TPU-native re-implementation of the reference's training orchestration
(reference: ``VarNet.py`` ``train``/``ManageTrainData``/``TrainResult`` —
SURVEY.md §2.1 #1, §3.2).  Departures, all deliberate (SURVEY.md §7):

  * The reference re-ships all quadrature data host->device every step via
    feed dicts; here the fixed data lives on device, sharded over the
    ``data`` mesh axis, and only the scalar loss/gradients cross chips
    (one XLA-lowered all-reduce per step).
  * The epoch loop over mini-batches is a ``lax.scan`` inside ONE jitted
    function — no Python per-batch dispatch.
  * Parameters and optimizer state are donated, so Adam updates are
    in-place on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import PointData, QuadData, _pad_to_multiple


def _tree_reshape_batches(quad: QuadData, batch_num: int) -> QuadData:
    """Split the leading test-function axis K into [batch_num, K//batch_num].

    Mirrors the reference's ``ManageTrainData`` batching over training
    points (SURVEY.md §3.2), but as a static reshape feeding a lax.scan.
    """
    k = quad.coords.shape[0]
    if k % batch_num != 0:
        raise ValueError(
            f"test-function count {k} not divisible by batch_num {batch_num}; "
            "assemble with pad_multiple = batch_num * n_devices"
        )
    kb = k // batch_num

    tables_per_node = quad.tables_per_node  # order-2 test space

    def r(a, per_node_axis0: bool):
        if not per_node_axis0:
            return a  # shared [nQ]-tables: replicated across batches
        return a.reshape((batch_num, kb) + a.shape[1:])

    return QuadData(
        coords=r(quad.coords, True),
        N=r(quad.N, tables_per_node),
        dN=r(quad.dN, tables_per_node),
        w=r(quad.w, tables_per_node),
        kappa=r(quad.kappa, True),
        vel=r(quad.vel, True),
        src=r(quad.src, True),
        react=r(quad.react, True),
        mask=r(quad.mask, True),
    )


def _pad_batched_axis1(quad: QuadData, multiple: int) -> QuadData:
    """Pad the PER-BATCH test axis of a batched QuadData ([B, Kb, ...])
    to a multiple of the shard count.

    Device-count invariance (VERDICT r3 item 6): mini-batch MEMBERSHIP is
    fixed by the batch split (pad to batch_num, reshape) BEFORE any
    shard padding, so the same real test rows land in the same batch for
    ANY n_devices; only masked filler rows (replicas of each batch's row
    0, zero mask) differ.  Without this, global pad-to-(B x n_shards)
    shifted the contiguous batch boundaries with the device count and
    silently changed the training trajectory.
    """
    kb = quad.coords.shape[1]
    target = _pad_to_multiple(kb, multiple)
    if target == kb:
        return quad

    per_node = quad.tables_per_node

    def pad(a, is_per_node: bool, fill_zero: bool = False):
        if not is_per_node:
            return a  # shared [nQ] tables: replicated across batches
        pad_n = target - kb
        filler = np.repeat(a[:, :1], pad_n, axis=1)
        if fill_zero:
            filler = np.zeros_like(filler)
        return np.concatenate([a, filler], axis=1)

    return QuadData(
        coords=pad(quad.coords, True),
        N=pad(quad.N, per_node),
        dN=pad(quad.dN, per_node),
        w=pad(quad.w, per_node),
        kappa=pad(quad.kappa, True),
        vel=pad(quad.vel, True),
        src=pad(quad.src, True),
        react=pad(quad.react, True),
        mask=pad(quad.mask, True, fill_zero=True),
    )


def make_train_step(
    loss_fn: Callable,
    optimizer,
    mesh=None,
    batch_num: int = 1,
    donate: bool = True,
    tables_per_node: bool = False,
    hard_present: bool = False,
):
    """Build the jitted per-epoch update.

    loss_fn: ``(theta, quad, bc, ic, obs, weights) -> (total, aux)`` from
        :func:`varnet_tpu.train.loss.make_loss_fn`.
    mesh: a ``jax.sharding.Mesh`` with a ``data`` axis.  The step is an
        EXPLICIT shard_map over it: each device computes loss+grads on its
        local shard of the fixed data, then exactly ONE ``psum`` per update
        reduces a single packed vector (flattened grads ++ aux scalars).
        This is the scaling-book replacement for the reference's TF1
        in-graph tower averaging (SURVEY.md §2.2/§5.8) — one fused
        all-reduce riding ICI instead of one collective per parameter leaf.
        ``mesh=None`` falls back to a plain (auto-sharded) jit.
    batch_num: >1 scans over interior-point mini-batches within the jitted
        epoch (BC/IC penalty points are small and kept full-batch, matching
        the reference's behaviour of re-using them every batch).

    Returns ``epoch_step(theta, opt_state, quad, bc, ic, obs, weights)
    -> (theta, opt_state, aux)`` where ``quad`` is batched
    ([batch_num, Kb, ...]) iff batch_num > 1.
    """
    from jax.flatten_util import ravel_pytree

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def reduce_and_update(theta, opt_state, grads, aux, reduce_fn):
        """Apply ``reduce_fn`` ONCE to (flat grads ++ raveled aux), then
        run the optimizer.  All-reduce count per update: exactly one.
        aux leaves may be scalars OR small arrays (e.g. per-member losses
        of an ensemble step) — they ravel into the same packed vector."""
        flat, unravel = ravel_pytree(grads)
        aux_flat, aux_unravel = ravel_pytree(aux)
        packed = jnp.concatenate([flat, aux_flat.astype(flat.dtype)])
        packed = reduce_fn(packed)
        grads = unravel(packed[: flat.shape[0]])
        aux = aux_unravel(packed[flat.shape[0]:].astype(aux_flat.dtype))
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = jax.tree_util.tree_map(lambda p, u: p + u, theta, updates)
        return theta, opt_state, aux

    def make_epoch_step(reduce_fn):
        def one_update(theta, opt_state, quad, bc, ic, obs, weights,
                       prepared=None, neu=None, hard=None):
            (_, aux), grads = grad_fn(theta, quad, bc, ic, obs, weights,
                                      prepared, neu, hard)
            return reduce_and_update(theta, opt_state, grads, aux, reduce_fn)

        if batch_num == 1:
            return one_update

        def epoch_step(theta, opt_state, quad, bc, ic, obs, weights,
                       prepared=None, neu=None, hard=None):
            if prepared is not None:
                # a prepared layout is built for the FULL (unbatched) quad
                # and cannot feed the per-batch kernel calls inside scan
                raise ValueError(
                    "prepared kernel layouts require batch_num == 1"
                )
            # Scan ONLY the per-node [B, Kb, ...] arrays; the shared [nQ]
            # quadrature tables are closed over, not scanned; per-node
            # [K, nQ] tables (order-2 test space) scan with the other
            # node arrays; hard-BC quad tables (reshaped to [B, Kb, ...]
            # by api._shard_hard) scan too, while the obs/flux hard
            # tables stay full-batch like their penalty rows.
            tables_per_node = quad.tables_per_node  # batched: [B, Kb, nQ]
            per_node = (quad.coords, quad.kappa, quad.vel, quad.src,
                        quad.react, quad.mask)
            if tables_per_node:
                per_node = per_node + (quad.N, quad.dN, quad.w)
            n_fixed = len(per_node)
            hq = hpts = hflux = None
            hq_slots = ()
            if hard is not None:
                hq, hpts, hflux = hard
                # static None-mask of the HardQuad fields (At/Bt absent on
                # steady problems): scan the arrays, rebuild with Nones
                hq_slots = tuple(a is not None for a in hq)
                per_node = per_node + tuple(a for a in hq if a is not None)

            def body(carry, batch):
                theta, opt_state = carry
                coords, kappa, vel, src, react, mask = batch[:6]
                tbls = batch[6:9] if tables_per_node else (quad.N, quad.dN,
                                                           quad.w)
                quad_b = QuadData(
                    coords=coords, N=tbls[0], dN=tbls[1], w=tbls[2],
                    kappa=kappa, vel=vel, src=src, react=react, mask=mask,
                )
                hard_b = None
                if hq is not None:
                    it = iter(batch[n_fixed:])
                    hq_b = type(hq)(*(next(it) if present else None
                                      for present in hq_slots))
                    hard_b = (hq_b, hpts, hflux)
                theta, opt_state, aux = one_update(
                    theta, opt_state, quad_b, bc, ic, obs, weights,
                    neu=neu, hard=hard_b,
                )
                return (theta, opt_state), aux

            (theta, opt_state), auxes = jax.lax.scan(
                body, (theta, opt_state), per_node
            )
            # mean over the BATCH axis only (aux leaves may be arrays,
            # e.g. per-member ensemble losses)
            aux = jax.tree_util.tree_map(lambda a: a.mean(axis=0), auxes)
            return theta, opt_state, aux

        return epoch_step

    donate_argnums = (0, 1) if donate else ()

    if mesh is None:
        # Auto-sharded fallback: XLA inserts the reductions (identity here).
        step = make_epoch_step(lambda x: x)
        jitted = jax.jit(step, donate_argnums=donate_argnums)

        def call(theta, opt_state, quad, bc, ic, obs, weights,
                 prepared=None, neu=None, hard=None):
            return jitted(theta, opt_state, quad, bc, ic, obs, weights,
                          prepared, neu, hard)

        call.jitted = jitted  # for lowering/inspection (HLO tests)
        return call

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    step = make_epoch_step(partial(jax.lax.psum, axis_name=DATA_AXIS))

    def step_with_prepared(theta, opt_state, quad, bc, ic, obs, weights,
                           prepared, neu, hard):
        # per-shard precomputed kernel layout arrives stacked on a
        # leading shard axis; drop it inside the shard_map body
        if prepared is not None:
            prepared = jax.tree_util.tree_map(lambda a: a[0], prepared)
        return step(theta, opt_state, quad, bc, ic, obs, weights, prepared,
                    neu, hard)

    rep = P()  # replicated: params, optimizer state, shared tables, weights
    per_node = P(None, DATA_AXIS) if batch_num > 1 else P(DATA_AXIS)
    tbl = per_node if tables_per_node else rep
    quad_spec = QuadData(
        coords=per_node, N=tbl, dN=tbl, w=tbl,
        kappa=per_node, vel=per_node, src=per_node, react=per_node,
        mask=per_node,
    )
    # bc/ic/obs use a single leaf spec: it broadcasts over the PointData
    # fields AND over a None argument (steady problems have ic=None).
    pt_spec = P(DATA_AXIS)
    # hard-BC transform tables (last operand) all carry a leading K/N
    # axis, so the single pt_spec broadcasts over the pytree — except in
    # mini-batch mode, where the QUAD tables are [B, Kb, ...] (axis 1
    # shards) while the obs/flux tables stay full-batch
    hard_spec = ((P(None, DATA_AXIS), pt_spec, pt_spec)
                 if (batch_num > 1 and hard_present) else pt_spec)

    sharded = jax.shard_map(
        step_with_prepared,
        mesh=mesh,
        in_specs=(rep, rep, quad_spec, pt_spec, pt_spec, pt_spec, rep,
                  pt_spec, pt_spec, hard_spec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=donate_argnums)

    def call(theta, opt_state, quad, bc, ic, obs, weights, prepared=None,
             neu=None, hard=None):
        return jitted(theta, opt_state, quad, bc, ic, obs, weights, prepared,
                      neu, hard)

    call.jitted = jitted  # for lowering/inspection (HLO tests)
    return call


def make_eval_fn(static, activation: str = "tanh", input_scaling: bool = True,
                 apply_fn=None):
    """Jitted pointwise network evaluation u(x[,t][,mu]) -> [P].

    Reference equivalent: ``VarNet.evaluate`` (SURVEY.md §1 table).
    """
    from ..models.mlp import make_input_scaling, mlp_apply

    if apply_fn is None:
        apply_fn = mlp_apply
    if input_scaling:
        scale, shift = make_input_scaling(static.input_lo, static.input_hi)
    else:
        scale = shift = None

    @jax.jit
    def eval_fn(theta, coords):
        net = theta["net"] if isinstance(theta, dict) and "net" in theta else theta
        return apply_fn(net, coords, activation, scale, shift)

    return eval_fn


@dataclass
class TrainResult:
    """Training history (reference ``TrainResult`` — SURVEY.md §2.1 #1)."""

    epochs: List[int] = field(default_factory=list)
    losses: List[Dict[str, float]] = field(default_factory=list)
    errors: List[float] = field(default_factory=list)      # rel-L2 vs c_ex
    wall_times: List[float] = field(default_factory=list)  # seconds since start
    quad_evals_per_sec: float = 0.0   # BASELINE.json driver metric
    steps_per_sec: float = 0.0
    total_steps: int = 0

    def as_dict(self) -> Dict[str, Any]:
        return {
            "epochs": self.epochs,
            "losses": self.losses,
            "errors": self.errors,
            "wall_times": self.wall_times,
            "quad_evals_per_sec": self.quad_evals_per_sec,
            "steps_per_sec": self.steps_per_sec,
            "total_steps": self.total_steps,
        }

    def best_error(self) -> Optional[float]:
        return min(self.errors) if self.errors else None


@dataclass
class EnsembleResult:
    """History of a multi-seed ensemble run (``VarNet.train_ensemble``).

    Beyond-reference, TPU-native capability: E independently-seeded nets
    train SIMULTANEOUSLY in one jitted step (vmap over the member axis —
    the reference would need E sequential runs).  At reference-scale
    widths the MXU is badly underutilized, so the marginal cost of extra
    members is far below Ex (measured in BASELINE.md).
    """

    epochs: List[int] = field(default_factory=list)
    member_losses: List[List[float]] = field(default_factory=list)  # [T][E]
    member_errors: List[List[float]] = field(default_factory=list)  # [T][E]
    wall_times: List[float] = field(default_factory=list)
    best_member: int = 0
    best_error: Optional[float] = None
    n_members: int = 0
    # member-evaluations/s: epochs * E * n_quad / wall (each member
    # evaluates every quad point every epoch)
    quad_evals_per_sec: float = 0.0
    steps_per_sec: float = 0.0

    def as_dict(self) -> Dict[str, Any]:
        return {
            "epochs": self.epochs,
            "member_losses": self.member_losses,
            "member_errors": self.member_errors,
            "wall_times": self.wall_times,
            "best_member": self.best_member,
            "best_error": self.best_error,
            "n_members": self.n_members,
            "quad_evals_per_sec": self.quad_evals_per_sec,
            "steps_per_sec": self.steps_per_sec,
        }
