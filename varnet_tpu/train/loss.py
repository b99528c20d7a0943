"""Variational (weak-form) total loss.

TPU-native re-implementation of the reference loss assembly
(reference: ``TFModel.py`` loss ops — SURVEY.md §0 item 5):

    L(theta) = w_int * sum_k |r_k|^2
             + w_bc  * mean_bc |u - g|^2
             + w_ic  * mean_ic |u - u0|^2
             [+ w_obs * mean_obs |u - u_obs|^2   (inverse problems)]

Built as a pure function of (trainable pytree, fixed data, weights) so it
jits/shards/differentiates cleanly.  The network evaluation path
(value-and-jacobian) is injected, letting the fused Pallas kernel replace
the stock matmul chain behind the same signature (SURVEY.md §7 step 6).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..fem.assembly import ProblemStatic
from ..models.mlp import make_input_scaling, mlp_apply, mlp_value_and_jac
from ..ops.residual import masked_mse, masked_sum_sq, weak_residual


def make_loss_fn(
    static: ProblemStatic,
    activation: str = "tanh",
    input_scaling: bool = True,
    value_and_jac: Callable = mlp_value_and_jac,
    apply_fn: Callable = mlp_apply,
    source_fn: Optional[Callable] = None,
    diff_fn: Optional[Callable] = None,
    vel_fn: Optional[Callable] = None,
    has_obs: bool = False,
    n_obs_real: int = 1,
    normalize_residual: bool = True,
    has_react: bool = False,
    nl_vec=None,
    fused_residual: Optional[Callable] = None,
    flux_value_and_jac: Optional[Callable] = None,
    hard_mode: bool = False,
):
    """Build the total-loss function for an assembled problem.

    source_fn: optional trainable source hook ``source_fn(phi, x, t) -> [P]``
        (x: [P, d] spatial coords, t: [P] or None).  When given, the
        trainable pytree must be ``{'net': mlp_params, 'src': phi}`` and the
        precomputed ``quad.src`` is ignored — this is the inverse
        source-identification mode (BASELINE.json config 5).
    diff_fn: optional trainable diffusivity hook
        ``diff_fn(psi, x, t) -> [P]`` (inverse COEFFICIENT identification
        — beyond even the inverse-source stretch config).  The trainable
        pytree must then carry ``theta['kap'] = psi`` and the precomputed
        ``quad.kappa`` is ignored.  kappa multiplies the du . dN
        contraction, so this mode rides the value+jac evaluator (the
        fused-residual hook declines it — api gating).
    vel_fn: optional trainable VELOCITY hook
        ``vel_fn(phi, x, t) -> [P, d]`` (inverse flow identification —
        the reference paper's mass-transport setting, recovering the
        advecting field from concentration observations).  The trainable
        pytree carries ``theta['vel']``; same value+jac-path gating as
        diff_fn.
    has_obs: when True the loss takes an observations PointData and a
        4-vector of weights (w_int, w_bc, w_ic, w_obs).
    nl_vec: constant [d] Burgers direction b for the nonlinear advection
        term u (b . grad u), or None (linear PDE).  When a
        ``fused_residual`` hook is given for a nonlinear problem it is
        the jacobian-panel kernel with the nl term baked in (api gating
        forces directional=False); this XLA branch is the fallback.

    hard_mode: exact BC/IC imposition (fem/hardbc.py).  The loss gains a
        ``hard = (HardQuad at quad coords, HardPts at obs coords or None,
        HardQuad at flux-penalty coords or None)`` operand of fixed
        transform tables; the BC/IC penalty rows drop out (exact by
        construction — reported as 0.0 in aux for logging stability),
        and observation rows compare the TRANSFORMED solution.  On the
        general path the network outputs are re-ansatzed via
        :func:`~varnet_tpu.fem.hardbc.hard_transform` BEFORE the weak
        residual; with a ``fused_residual`` hook the ansatz is instead
        FOLDED INTO the precomputed integrand coefficients (the weak
        residual is AFFINE in the raw network outputs —
        prepare_residual_coeffs ``hard=``), so the hook must be the
        precoeff kernel prepared with the same tables (api gating
        guarantees it; the quad-table leg ``hard[0]`` is forwarded to
        the hook for its prepare-in-graph fallback).

    Returns ``loss_fn(theta, quad, bc, ic, obs, weights) -> (total, aux)``;
    ``ic``/``obs`` may be None for steady / non-inverse problems (decided
    statically here, not traced).
    """
    if fused_residual is not None and (diff_fn is not None or vel_fn is not None):
        # the fully-fused kernel integrates FIXED quad.kappa/quad.vel;
        # accepting trainable hooks here would give theta['kap']/['vel']
        # exactly zero gradient with no error (api gating declines the
        # kernel for inverse-coefficient problems — enforce it here too)
        raise ValueError(
            "fused_residual is incompatible with trainable diff_fn/vel_fn"
        )
    d = static.n_space
    td = static.time_dependent
    n_in = static.n_inputs
    # Global real point counts: static denominators so that per-shard
    # partial losses psum to the exact global value (see masked_mse).
    n_bc = float(max(static.n_bc, 1))
    n_ic = float(max(static.n_ic, 1))
    n_obs = float(max(int(n_obs_real), 1))
    n_neu = float(max(getattr(static, "n_neu", 0), 1))
    nl_vec = None if nl_vec is None else jnp.asarray(nl_vec, jnp.float32)
    need_u = has_react or nl_vec is not None
    if input_scaling:
        scale, shift = make_input_scaling(static.input_lo, static.input_hi)
    else:
        scale = shift = None

    def net_params(theta):
        return theta["net"] if isinstance(theta, dict) and "net" in theta else theta

    def loss_fn(theta, quad, bc, ic=None, obs=None, weights=(1.0, 1.0, 1.0),
                prepared=None, neu=None, hard=None):
        net = net_params(theta)
        weights = jnp.asarray(weights)
        if has_obs and weights.shape[0] < 4:
            # weights[3] on a 3-vector would CLAMP to weights[2] (JAX
            # gather semantics): w_obs silently becomes w_ic — require
            # the explicit 4th (observation) weight instead
            raise ValueError(
                "has_obs requires a 4th (observation) loss weight"
            )
        if has_obs and obs is None:
            raise ValueError("has_obs=True but the obs batch is None")
        k, nq = quad.coords.shape[0], quad.coords.shape[1]
        if fused_residual is not None:
            # fully-fused kernel: network + contraction in VMEM, r out;
            # `prepared` (per-shard precomputed kernel layout, threaded by
            # the trainer) skips the per-step data relayout.  hard_mode:
            # the transform is already folded into those coefficients;
            # hard[0] only feeds the prepare-in-graph fallback.
            extra = {"hard": hard[0]} if hard_mode else {}
            r = fused_residual(net, quad, activation, scale, shift,
                               prepared=prepared, **extra)
            if source_fn is not None:
                # Inverse-source mode: the trainable source enters the weak
                # form linearly, so the kernel integrates with quad.src
                # ZEROED (the trainer zeroes it, api.train) and the -s N w
                # term is the one remaining XLA-side contraction.
                flat = quad.coords.reshape(k * nq, n_in)
                t_flat = flat[:, d] if td else None
                src = source_fn(
                    theta["src"], flat[:, :d], t_flat
                ).reshape(k, nq)
                r = r - jnp.sum(quad.w * quad.N * src, axis=-1)
        else:
            flat = quad.coords.reshape(k * nq, n_in)
            u, du = value_and_jac(net, flat, activation, scale, shift)
            grad_u = du[:, :d].reshape(k, nq, d)
            u_t = du[:, d].reshape(k, nq) if td else None
            if source_fn is not None:
                t_flat = flat[:, d] if td else None
                src = source_fn(theta["src"], flat[:, :d], t_flat).reshape(k, nq)
            else:
                src = quad.src
            u_q = u.reshape(k, nq) if need_u else None
            if diff_fn is not None:
                t_flat = flat[:, d] if td else None
                kap = diff_fn(theta["kap"], flat[:, :d], t_flat).reshape(k, nq)
            else:
                kap = quad.kappa
            if vel_fn is not None:
                t_flat = flat[:, d] if td else None
                vel = vel_fn(
                    theta["vel"], flat[:, :d], t_flat
                ).reshape(k, nq, d)
            else:
                vel = quad.vel
            if hard_mode:
                from ..fem.hardbc import hard_transform

                u_hq = u.reshape(k, nq)
                u_hq, grad_u, u_t = hard_transform(u_hq, grad_u, u_t, hard[0])
                u_q = u_hq if need_u else None
            r = weak_residual(
                grad_u, quad.N, quad.dN, quad.w, kap, vel, src, u_t,
                u=u_q, react=quad.react if has_react else None,
                nl_vec=nl_vec,
            )
        if normalize_residual:
            # r_k scales with the test-function support volume (= sum of the
            # quadrature weights); dividing makes r_k an average residual
            # density, and the mean over the STATIC global test-function
            # count (shard-safe, cf. masked_mse) makes loss conditioning and
            # weight choices mesh-size independent — an improvement over the
            # reference, whose raw sum of r_k^2 shrinks as O(h^2D) under
            # refinement.  Per-node [K, nQ] tables (order-2 test space)
            # carry per-CLASS support volumes, so the division is per node.
            vol = (jnp.sum(quad.w, axis=-1) if quad.tables_per_node
                   else jnp.sum(quad.w))
            r = r / vol
            loss_int = masked_sum_sq(r, quad.mask) / float(max(static.n_test, 1))
        else:
            loss_int = masked_sum_sq(r, quad.mask)

        if hard_mode:
            # BC/IC are exact by construction; keep the aux keys (0.0) so
            # logging/printing paths stay uniform across modes.
            loss_bc = jnp.zeros(())
        else:
            u_bc = apply_fn(net, bc.coords, activation, scale, shift)
            loss_bc = masked_mse(u_bc, bc.values, bc.mask, n_bc)

        total = weights[0] * loss_int + weights[1] * loss_bc
        aux = {"loss_int": loss_int, "loss_bc": loss_bc}
        if neu is not None:
            # Neumann (flux) penalty, sharing the Dirichlet weight w_bc:
            # dirs = kappa * n precomputed, so the residual is one
            # jacobian contraction (beyond-reference — NeumannBC).  The
            # flux batch is TINY (BC-scale), so it rides the XLA matmul
            # chain (flux_value_and_jac) rather than the interior's
            # injected/fused Pallas evaluator, whose tiling assumes
            # quad-scale batches.
            vj = flux_value_and_jac or mlp_value_and_jac
            u_n, du_n = vj(net, neu.coords, activation, scale, shift)
            grad_n = du_n[:, :d]
            if hard_mode:
                # flux rows see the TRANSFORMED solution (Dirichlet/IC
                # are exact; flux stays a penalty — fem/hardbc.py)
                hn = hard[2]
                grad_n = hn.dA + hn.dB * u_n[:, None] + hn.B[:, None] * grad_n
                u_n = hn.A + hn.B * u_n
            flux = (jnp.einsum("nd,nd->n", grad_n, neu.dirs)
                    + neu.alpha * u_n)  # Robin term; alpha=0 for Neumann
            loss_neu = masked_mse(flux, neu.values, neu.mask, n_neu)
            total = total + weights[1] * loss_neu
            aux["loss_neu"] = loss_neu
        if ic is not None:
            if hard_mode:
                loss_ic = jnp.zeros(())
            else:
                u_ic = apply_fn(net, ic.coords, activation, scale, shift)
                loss_ic = masked_mse(u_ic, ic.values, ic.mask, n_ic)
                total = total + weights[2] * loss_ic
            aux["loss_ic"] = loss_ic
        if has_obs:
            u_obs = apply_fn(net, obs.coords, activation, scale, shift)
            if hard_mode:
                # observations see the TRANSFORMED solution
                u_obs = hard[1].A + hard[1].B * u_obs
            loss_obs = masked_mse(u_obs, obs.values, obs.mask, n_obs)
            total = total + weights[3] * loss_obs
            aux["loss_obs"] = loss_obs
        aux["loss"] = total
        return total, aux

    return loss_fn
