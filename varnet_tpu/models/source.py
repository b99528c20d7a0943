"""Trainable source fields for inverse source identification.

BASELINE config 5 (stretch beyond the reference: SURVEY.md §3.5 notes the
reference's MOR hook is the generalization point for "inverse source
identification: joint source + trial-net training").  The source enters
the weak-form residual as a trainable callable ``source_fn(phi, x, t)``;
gradients flow to phi through the same variational loss, jointly with the
trial network (see ``varnet_tpu.train.loss.make_loss_fn``'s ``source_fn``
hook).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .mlp import Params, init_mlp, make_input_scaling, mlp_apply


def make_mlp_source(
    key: jax.Array,
    n_space: int,
    hidden: Sequence[int] = (16, 16),
    lo=None,
    hi=None,
    activation: str = "tanh",
):
    """(source_fn, phi0): a small MLP source field s_phi(x).

    Time-independent by construction (t is ignored); use
    :func:`make_mlp_source_xt` for s(x, t).
    """
    scale = shift = None
    if lo is not None and hi is not None:
        scale, shift = make_input_scaling(lo, hi)
    phi0 = init_mlp(key, n_space, hidden, n_out=1)

    def source_fn(phi: Params, x: jax.Array, t=None) -> jax.Array:
        return mlp_apply(phi, x, activation, scale, shift)

    return source_fn, phi0


def make_mlp_source_xt(
    key: jax.Array,
    n_space: int,
    hidden: Sequence[int] = (16, 16),
    lo=None,
    hi=None,
    activation: str = "tanh",
):
    """(source_fn, phi0): an MLP source field s_phi(x, t)."""
    scale = shift = None
    if lo is not None and hi is not None:
        scale, shift = make_input_scaling(lo, hi)
    phi0 = init_mlp(key, n_space + 1, hidden, n_out=1)

    def source_fn(phi: Params, x: jax.Array, t: jax.Array) -> jax.Array:
        xt = jnp.concatenate([x, t[:, None]], axis=-1)
        return mlp_apply(phi, xt, activation, scale, shift)

    return source_fn, phi0


def make_gaussian_source(n_space: int, time_gate: bool = False):
    """(source_fn, phi0): a parametric Gaussian source
    s_phi(x) = amp * exp(-|x - c|^2 / (2 sigma^2)), phi = (amp, c, log_sigma).

    The classic source-localization parameterization (few-parameter inverse
    problems; cf. the reference's MOR source-location amortization,
    SURVEY.md §0 item 1).
    """
    phi0 = {
        "amp": jnp.asarray(1.0),
        "center": jnp.zeros((n_space,)),
        "log_sigma": jnp.asarray(-1.0),
    }

    def source_fn(phi, x: jax.Array, t=None) -> jax.Array:
        sigma2 = jnp.exp(2.0 * phi["log_sigma"])
        d2 = jnp.sum((x - phi["center"][None, :]) ** 2, axis=-1)
        return phi["amp"] * jnp.exp(-d2 / (2.0 * sigma2))

    return source_fn, phi0
