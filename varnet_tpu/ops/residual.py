"""Weak-form residual contraction.

TPU-native re-implementation of the reference's in-graph residual ops
(reference: ``TFModel.py`` residual contraction — SURVEY.md §3.1):

    r_k = sum_q w_q * [ u_t N_q + (v . grad u) N_q + kappa grad u . dN_q
                        - s N_q ]

All test-function data (N, dN, w) are constants shared across nodes; the
contraction is pure elementwise + reduction work that XLA fuses into the
surrounding computation (BASELINE.json north star: "batched einsums").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def weak_residual(
    grad_u: jnp.ndarray,          # [K, nQ, d]  spatial gradient of the net
    n: jnp.ndarray,               # [nQ] or [K, nQ]     test-function values
    dn: jnp.ndarray,              # [nQ, d] or [K, nQ, d] spatial test grads
    w: jnp.ndarray,               # [nQ] or [K, nQ]  Gauss weight x detJ
    kappa: jnp.ndarray,           # [K, nQ]
    vel: jnp.ndarray,             # [K, nQ, d]
    src: jnp.ndarray,             # [K, nQ]
    u_t: Optional[jnp.ndarray] = None,  # [K, nQ] (time-dependent only)
    u: Optional[jnp.ndarray] = None,    # [K, nQ] net values (reaction/nl)
    react: Optional[jnp.ndarray] = None,  # [K, nQ] reaction coefficient
    nl_vec: Optional[jnp.ndarray] = None,  # [d] constant Burgers direction
) -> jnp.ndarray:
    """Per-test-function weak residual r_k -> [K].

    Integration by parts has been applied only to the diffusion term
    (SURVEY.md §0 item 3), so only FIRST derivatives of the network appear.
    The optional reaction term adds + c u (advection-diffusion-reaction),
    and the optional ``nl_vec`` adds the nonlinear advection term
    + u (b . grad u) — the viscous-Burgers family (both beyond-reference
    extensions; both need ``u``).

    Test tables come in two layouts, distinguished statically by rank:
    [nQ]-shaped tables shared by every node (order-1 hats on a uniform
    grid), or per-node [K, nQ] tables (the order-2 quadratic test space,
    where nodes belong to different vertex/bubble classes —
    fem/element.py build_test_classes).
    """
    n2 = n if n.ndim == 2 else n[None, :]
    adv = jnp.einsum("kqd,kqd->kq", vel, grad_u)
    integrand = (adv - src) * n2
    if u_t is not None:
        integrand = integrand + u_t * n2
    if react is not None and u is not None:
        integrand = integrand + react * u * n2
    if nl_vec is not None and u is not None:
        integrand = integrand + u * jnp.einsum("kqd,d->kq", grad_u, nl_vec) * n2
    if dn.ndim == 3:
        diff = kappa * jnp.einsum("kqd,kqd->kq", grad_u, dn)
    else:
        diff = kappa * jnp.einsum("kqd,qd->kq", grad_u, dn)
    integrand = integrand + diff
    if w.ndim == 2:
        return jnp.einsum("kq,kq->k", integrand, w)
    return jnp.einsum("kq,q->k", integrand, w)


def masked_sum_sq(r: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum_k mask_k * r_k^2 (padding-safe interior loss term)."""
    return jnp.sum(mask * r * r)


def masked_mse(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, denom: float
) -> jnp.ndarray:
    """Padding-safe mean squared error for BC/IC/observation penalties.

    ``denom`` is the GLOBAL real point count (a static value from assembly,
    ``ProblemStatic.n_bc`` etc.), NOT sum(mask): under the shard_map train
    step each device sees only its shard, and per-shard partial sums divided
    by the global count psum to the exact global mean.
    """
    err = (pred - target) * mask
    return jnp.sum(err * err) / denom
