"""Trial-function network: MLP with fused value + input-jacobian forward.

TPU-native re-implementation of the reference NN backend
(reference: ``TFModel.py``, class ``TFNN`` — SURVEY.md §2.1 #2).  The
reference builds a TF1 graph MLP and calls ``tf.gradients(u, inputs)`` for
grad(u) and u_t (SURVEY.md §3.1).  Here the input jacobian is propagated in
FORWARD mode alongside the activations, expressed as batched matmuls:

    state per point = [(1 + n_in), H] block: row 0 is the activation, rows
    1..n_in are the jacobian rows d(activation)/d(x_j).

Each layer is then ONE matmul of shape [P*(1+n_in), H_in] @ [H_in, H_out]
plus elementwise work — exactly the large, batched, static-shape form the
MXU wants, and fully differentiable by JAX for the parameter gradients.
This is the correct-by-construction path; ``varnet_tpu.ops.pallas_mlp``
provides a fused Pallas kernel behind the same signature (SURVEY.md §7
step 6).

Params are a plain pytree: a list of {'w': [in, out], 'b': [out]} dicts.
Inputs may be affinely scaled to [-1, 1] (jacobians are chain-ruled back to
the ORIGINAL coordinates, so the PDE machinery never sees the scaling).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = List[dict]


def _activation_pair(name: str) -> Tuple[Callable, Callable]:
    """Return (act, act_prime(z, a)): the derivative receives BOTH the
    pre-activation z and the output a, so tanh/sigmoid reuse the output
    (one transcendental) while sin uses z (SIREN-style nets — the natural
    basis for oscillatory PDE solutions)."""
    if name == "tanh":
        return jnp.tanh, lambda z, a: 1.0 - a * a
    if name == "sigmoid":
        return jax.nn.sigmoid, lambda z, a: a * (1.0 - a)
    if name == "sin":
        return jnp.sin, lambda z, a: jnp.cos(z)
    raise ValueError(f"unknown activation '{name}' (expected tanh|sigmoid|sin)")


def init_mlp(
    key: jax.Array,
    n_in: int,
    hidden: Sequence[int],
    n_out: int = 1,
    dtype=jnp.float32,
) -> Params:
    """Glorot-normal initialized MLP parameters.

    ``hidden`` mirrors the reference's ``layerWidth`` constructor argument
    (SURVEY.md §1 public-surface table).
    """
    sizes = [int(n_in)] + [int(h) for h in hidden] + [int(n_out)]
    params: Params = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        std = math.sqrt(2.0 / (fan_in + fan_out))
        params.append(
            {
                "w": std * jax.random.normal(sub, (fan_in, fan_out), dtype=dtype),
                "b": jnp.zeros((fan_out,), dtype=dtype),
            }
        )
    return params


def init_siren(
    key: jax.Array,
    n_in: int,
    hidden: Sequence[int],
    n_out: int = 1,
    omega0: float = 6.0,
    dtype=jnp.float32,
) -> Params:
    """SIREN initialization (Sitzmann et al. 2020) for sin-activation nets.

    First layer ~ U(-omega0/n_in, omega0/n_in) (the frequency multiplier
    folded into the weights; inputs are expected scaled to [-1, 1]); deeper
    layers ~ U(-sqrt(6/fan_in), sqrt(6/fan_in)).
    """
    sizes = [int(n_in)] + [int(h) for h in hidden] + [int(n_out)]
    params: Params = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        bound = (omega0 / fan_in) if i == 0 else math.sqrt(6.0 / fan_in)
        params.append(
            {
                "w": jax.random.uniform(
                    sub, (fan_in, fan_out), dtype=dtype,
                    minval=-bound, maxval=bound,
                ),
                "b": jnp.zeros((fan_out,), dtype=dtype),
            }
        )
    return params


def make_input_scaling(lo, hi, dtype=jnp.float32):
    """Affine map of inputs onto [-1, 1]: x_n = (x - shift) * scale."""
    lo = jnp.asarray(lo, dtype=dtype)
    hi = jnp.asarray(hi, dtype=dtype)
    scale = 2.0 / jnp.where(hi > lo, hi - lo, 1.0)
    shift = (lo + hi) / 2.0
    return scale, shift


def mlp_apply(
    params: Params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> jax.Array:
    """u_theta(x) for x: [P, n_in] -> [P]."""
    act, _ = _activation_pair(activation)
    a = x if scale is None else (x - shift) * scale
    a = a.astype(params[0]["w"].dtype)
    for layer in params[:-1]:
        a = act(a @ layer["w"] + layer["b"])
    out = a @ params[-1]["w"] + params[-1]["b"]
    return out[..., 0]


def mlp_value_and_jac(
    params: Params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(u, du/dx) at x: [P, n_in] -> ([P], [P, n_in]).

    Forward-mode jacobian propagation as one fused matmul chain.  The
    jacobian is with respect to the ORIGINAL (unscaled) inputs.
    """
    act, act_prime = _activation_pair(activation)
    p, n_in = x.shape
    dtype = params[0]["w"].dtype
    a = (x if scale is None else (x - shift) * scale).astype(dtype)
    # Jacobian of the (scaled) input wrt the original input.
    eye = jnp.eye(n_in, dtype=dtype)
    if scale is not None:
        eye = eye * scale[None, :].astype(dtype)
    jac = jnp.broadcast_to(eye, (p, n_in, n_in))
    for layer in params[:-1]:
        w, b = layer["w"], layer["b"]
        # State matmul: [P*(1+n_in), H_in] @ [H_in, H_out] in one shot.
        state = jnp.concatenate([a[:, None, :], jac], axis=1)
        state = (state.reshape(p * (1 + n_in), -1) @ w).reshape(p, 1 + n_in, -1)
        z = state[:, 0, :] + b
        a = act(z)
        jac = state[:, 1:, :] * act_prime(z, a)[:, None, :]
    w, b = params[-1]["w"], params[-1]["b"]
    state = jnp.concatenate([a[:, None, :], jac], axis=1)
    state = (state.reshape(p * (1 + n_in), -1) @ w).reshape(p, 1 + n_in, -1)
    u = state[:, 0, 0] + b[0]
    du = state[:, 1:, 0]
    return u, du


def make_fourier_features(key: jax.Array, n_in: int, n_feat: int,
                          scale: float = 1.0) -> jax.Array:
    """Random Fourier feature matrix B [n_in, n_feat] (Tancik et al. 2020).

    The embedding gamma(x) = [sin(2 pi x B), cos(2 pi x B)] (2*n_feat dims)
    counters the spectral bias of plain MLPs on oscillatory PDE solutions.
    B is FIXED (not trained); inputs are expected pre-scaled to [-1, 1].

    ALIASING WARNING (measured, see tests): with a fixed quadrature mesh,
    embeddings remove the spectral bias that normally prevents the
    optimizer from zeroing the DISCRETE loss with a spurious
    high-frequency solution.  Keep ``scale`` modest (default 0.5) and the
    constraint count (test functions + BC/IC points) comfortably above
    the parameter count, or refine the mesh / raise integ_p_num.

    ``scale`` may be a sequence of floats, in which case ``n_feat`` is
    split evenly across the scales (remainder to the first block) and the
    per-scale blocks are concatenated — a MULTI-SCALE basis (low scales
    for the bulk field, high for thin layers/plumes).  Measured on the
    contaminant field (benchmarks/contaminant_rep_probe2.py): scales
    (0.5, 2.0) supervised-fit to 0.8% rel-L2 where any single scale
    plateaus 5-10x higher.
    """
    if isinstance(scale, str):
        # config round-trip friendliness: "0.5" or "0.5,2.0"
        scale = [float(s) for s in scale.split(",")]
        if len(scale) == 1:
            scale = scale[0]
    if isinstance(scale, (int, float)):
        return float(scale) * jax.random.normal(key, (int(n_in), int(n_feat)))
    scales = [float(s) for s in scale]
    n_feat = int(n_feat)
    counts = [n_feat // len(scales)] * len(scales)
    counts[0] += n_feat - sum(counts)
    blocks = []
    for s, n in zip(scales, counts):
        key, sub = jax.random.split(key)
        blocks.append(s * jax.random.normal(sub, (int(n_in), n)))
    return jnp.concatenate(blocks, axis=1)


def ff_apply(
    b_mat: jax.Array,
    params: Params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> jax.Array:
    """u_theta(x) through the Fourier-feature embedding: [P, n_in] -> [P]."""
    act, _ = _activation_pair(activation)
    dtype = params[0]["w"].dtype
    xs = (x if scale is None else (x - shift) * scale).astype(dtype)
    ang = 2.0 * jnp.pi * (xs @ b_mat.astype(dtype))
    a = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    for layer in params[:-1]:
        a = act(a @ layer["w"] + layer["b"])
    out = a @ params[-1]["w"] + params[-1]["b"]
    return out[..., 0]


def ff_value_and_jac(
    b_mat: jax.Array,
    params: Params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(u, du/dx) through a Fourier-feature embedding + MLP.

    Forward-mode: only n_in tangent rows propagate (the embedding jacobian
    seeds them), so cost matches the plain-MLP path at equal width.  The
    MLP's input width must be 2 * n_feat.
    """
    act, act_prime = _activation_pair(activation)
    p, n_in = x.shape
    dtype = params[0]["w"].dtype
    xs = (x if scale is None else (x - shift) * scale).astype(dtype)
    bm = b_mat.astype(dtype)
    ang = 2.0 * jnp.pi * (xs @ bm)  # [P, F]
    a = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [P, 2F]
    # d(ang)/dx_j = 2 pi B[j, :] (times input scale)
    dxs = jnp.eye(n_in, dtype=dtype)
    if scale is not None:
        dxs = dxs * scale[None, :].astype(dtype)
    dang = 2.0 * jnp.pi * (dxs @ bm)  # [n_in, F]
    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
    jac = jnp.concatenate(
        [cos_a[:, None, :] * dang[None, :, :],
         -sin_a[:, None, :] * dang[None, :, :]],
        axis=-1,
    )  # [P, n_in, 2F]
    for layer in params[:-1]:
        w, b = layer["w"], layer["b"]
        state = jnp.concatenate([a[:, None, :], jac], axis=1)
        state = (state.reshape(p * (1 + n_in), -1) @ w).reshape(p, 1 + n_in, -1)
        z = state[:, 0, :] + b
        a = act(z)
        jac = state[:, 1:, :] * act_prime(z, a)[:, None, :]
    w, b = params[-1]["w"], params[-1]["b"]
    state = jnp.concatenate([a[:, None, :], jac], axis=1)
    state = (state.reshape(p * (1 + n_in), -1) @ w).reshape(p, 1 + n_in, -1)
    return state[:, 0, 0] + b[0], state[:, 1:, 0]


def mlp_value_and_jac_auto(
    params: Params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Autodiff reference for :func:`mlp_value_and_jac` (tests/golden)."""

    def single(xi):
        return mlp_apply(params, xi[None, :], activation, scale, shift)[0]

    u = jax.vmap(single)(x)
    du = jax.vmap(jax.grad(single))(x)
    return u, du


def param_count(params: Params) -> int:
    return int(sum(np.prod(p["w"].shape) + np.prod(p["b"].shape) for p in params))
