"""Fully-fused weak-form residual kernel: network + contraction in one op.

Computes r_k = sum_q w_q [ u_t N_q + (v . grad u) N_q + c u N_q
                           + kappa grad u . dN_q - s N_q ]
directly from the quadrature coordinates — the MLP forward + input
jacobian (panel-packed, see pallas_mlp.py) runs in VMEM and the per-point
integrand is reduced into r WITHOUT ever writing u/du to HBM (~140 MB of
round-trip traffic per step at bench size, plus the XLA-side einsums).

Grid layout: points are reordered Q-MAJOR (column index = q * K + k), so
each program instance handles one quadrature index q for a tile of K test
functions; r accumulates across the sequential q grid dimension into a
constant-indexed output block.  The shared quadrature tables (N, dN, w)
are indexed by q from SMEM.

Backward: the cotangent of r w.r.t. the per-point network outputs is a
closed form of the fixed data —
    du/d(u)   = gr_k w_q (c N_q)
    d/d(du_j) = gr_k w_q (v_j N_q + kappa dN_qj)      (original coords)
    d/d(u_t)  = gr_k w_q N_q
— so the backward kernel recomputes the packed forward per block, forms
these cotangents in-kernel, and accumulates dW/db exactly like
pallas_mlp's packed backward.  Parameter gradients only (quadrature data
is fixed).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import (_act_pair, _make_mm, _outer, _packed_bwd_tail,
                         _round_up, _small_k_mm, _small_n_mm_t)

DEFAULT_TILE_K = 4096        # jacobian-panel kernel: measured best on v5e
DEFAULT_TILE_K_DIR = 8192    # directional kernel: smaller VMEM state admits
                             # bigger tiles; measured +7.7% over 4096 and the
                             # start of the 8192/12288/16384 plateau (least
                             # K-padding waste of the plateau)


def _packed_forward(_mm, act, act_p, n_in, n_layers, w_refs, xs, t):
    """Panel-packed MLP forward (cf. pallas_mlp._fwd_kernel body).
    Returns (u [1,T], du list of n_in panels [1,T], s_packed list, zs, acts)."""
    z = _small_k_mm(w_refs[0][:], xs, n_in) + w_refs[1][:]
    a = act(z)
    sp = act_p(z, a)
    s = jnp.concatenate(
        [a] + [sp * w_refs[0][:, j : j + 1] for j in range(n_in)], axis=1
    )
    zs, acts, s_packed = [z], [a], [s]
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        zc = _mm(wt, s)
        z = zc[:, :t] + b
        a = act(z)
        sp = act_p(z, a)
        sp_tiled = jnp.concatenate([sp] * n_in, axis=1)
        s = jnp.concatenate([a, sp_tiled * zc[:, t:]], axis=1)
        zs.append(z)
        acts.append(a)
        s_packed.append(s)
    wt, b = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    oc = _mm(wt, s)
    u = oc[:, :t] + b
    du = [oc[:, (j + 1) * t : (j + 2) * t] for j in range(n_in)]
    return u, du, s_packed, zs, acts


def _integrand_coeffs(f_ref, tab_ref, scale_ref, q, d, td, has_react,
                      n_mor=0):
    """Per-point coefficients of (u, du_scaled_j) in the weighted integrand.

    Returns (cu [1,T] or None, cdu list of n_in [1,T] panels) such that
    contribution = cu * u + sum_j cdu_j * du_scaled_j  (source term handled
    separately).  tab_ref rows: [N | w | dN_1..dN_d] with shape [nQ, 2+d].
    MOR inputs (n_mor trailing coordinate rows, SURVEY.md §3.5) never
    appear differentiated in the weak form — their panels get ZERO
    coefficients, which is what makes parametric problems eligible for
    this kernel.
    """
    n_q = tab_ref[q, 0]
    w_q = tab_ref[q, 1]
    kappa = f_ref[0:1, :]
    cdu = []
    for j in range(d):
        vel_j = f_ref[1 + j : 2 + j, :]
        dn_qj = tab_ref[q, 2 + j]
        cdu.append(w_q * scale_ref[j, 0] * (vel_j * n_q + kappa * dn_qj))
    if td:
        cdu.append(w_q * scale_ref[d, 0] * n_q * jnp.ones_like(kappa))
    for _ in range(n_mor):
        cdu.append(jnp.zeros_like(kappa))
    cu = None
    if has_react:
        react = f_ref[2 + d : 3 + d, :]
        cu = w_q * n_q * react
    src = f_ref[1 + d : 2 + d, :]
    c_src = -w_q * n_q * src  # constant (theta-independent) part
    return cu, cdu, c_src


def _fused_fwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                      nl, *refs):
    """refs: xs [n_in,T], f [n_f,T], tab (SMEM [nQ, 2+d]),
    scale (SMEM [n_in,1]), Wt/b pairs, out r [1,T].

    nl: optional length-d tuple b — adds the NONLINEAR advection term
    u (b . grad u) N w to the integrand (viscous Burgers, DESIGN.md
    decision 16).  Only this jacobian-panel variant supports it: the
    term is BILINEAR in (u, du), which the directional trick's single
    precomputed contraction direction cannot express."""
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_layers]
    r_ref = refs[4 + 2 * n_layers]
    t = xs_ref.shape[1]
    q = pl.program_id(1)

    u, du, _, _, _ = _packed_forward(
        _mm, act, act_p, n_in, n_layers, w_refs, xs_ref[:], t
    )
    cu, cdu, c_src = _integrand_coeffs(
        f_ref, tab_ref, scale_ref, q, d, td, has_react,
        n_mor=n_in - d - (1 if td else 0),
    )
    contrib = c_src
    for j in range(n_in):
        contrib = contrib + cdu[j] * du[j]
    if cu is not None:
        contrib = contrib + cu * u
    if nl is not None:
        dub = None  # b . grad u in ORIGINAL coords (scale un-does xs scaling)
        for j in range(d):
            term = (nl[j] * scale_ref[j, 0]) * du[j]
            dub = term if dub is None else dub + term
        contrib = contrib + (tab_ref[q, 1] * tab_ref[q, 0]) * (u * dub)

    @pl.when(q == 0)
    def _():
        r_ref[:] = contrib

    @pl.when(q != 0)
    def _():
        r_ref[:] = r_ref[:] + contrib


def _fused_bwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                      nl, *refs):
    """refs: xs, f, tab, scale, gr [1,T], Wt/b pairs, outs dWt/db pairs.

    With nl, the integrand is BILINEAR in (u, du), so the output
    cotangents gain solution-dependent parts (the recomputed u/du are
    already in VMEM):  d/du += gr w N (b . du),  d/d(du_j) += gr w N u b_j.
    """
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref, gr_ref = refs[:5]
    w_refs = refs[5 : 5 + 2 * n_layers]
    out_refs = refs[5 + 2 * n_layers :]
    t = xs_ref.shape[1]
    i = pl.program_id(0)
    q = pl.program_id(1)
    xs = xs_ref[:]

    u, du, s_packed, zs, acts = _packed_forward(
        _mm, act, act_p, n_in, n_layers, w_refs, xs, t
    )
    cu, cdu, _ = _integrand_coeffs(
        f_ref, tab_ref, scale_ref, q, d, td, has_react,
        n_mor=n_in - d - (1 if td else 0),
    )
    gr = gr_ref[:]
    g_rows = [gr * cu if cu is not None else jnp.zeros_like(gr)]
    g_rows += [gr * cdu[j] for j in range(n_in)]
    if nl is not None:
        c = tab_ref[q, 1] * tab_ref[q, 0]  # w_q * N_q
        dub = None
        for j in range(d):
            term = (nl[j] * scale_ref[j, 0]) * du[j]
            dub = term if dub is None else dub + term
        g_rows[0] = g_rows[0] + (gr * c) * dub
        gcu = (gr * c) * u
        for j in range(d):
            g_rows[1 + j] = g_rows[1 + j] + (nl[j] * scale_ref[j, 0]) * gcu
    del u, du

    def accum(ref, val):
        @pl.when((i == 0) & (q == 0))
        def _():
            ref[:] = val

        @pl.when((i != 0) | (q != 0))
        def _():
            ref[:] = ref[:] + val

    _packed_bwd_tail(
        n_in, n_layers, t, _mm, act_p, act_pp, w_refs, out_refs, accum,
        xs, zs, acts, s_packed, g_rows,
        # _packed_forward stores no pre panels: recompute P_l^j from the
        # previous packed state
        pre_panel=lambda l, j: _mm(
            w_refs[2 * l][:],
            s_packed[l - 1][:, (j + 1) * t : (j + 2) * t],
        ),
    )


# ---------------------------------------------------------------------- #
# DIRECTIONAL variant (round 2): the weak integrand only ever uses the
# CONTRACTION of the network jacobian with a fixed per-point vector,
#
#     contrib(x, q) = du . c(x, q) + cu u + c_src,
#     c_j = w_q s_j (v_j N_q + kappa dN_qj)   (j < d),   c_t = w_q s_t N_q,
#
# i.e. a DIRECTIONAL derivative with direction c computable from the fixed
# data in-kernel.  Forward-mode therefore needs ONE seeded tangent panel
# instead of n_in jacobian panels: the packed state shrinks from
# [H, (1+n_in) T] to [H, 2 T] — ~(1+n_in)/2 x less matmul work per layer
# (2x on the 2-D transient flagship).  The backward shrinks identically.
# This is a kernel the reference's TF1 graph could never express: the
# contraction direction lives inside the quadrature tables.


def _dir_coeffs(f_ref, tab_ref, scale_ref, q, d, td, has_react, like,
                n_mor=0):
    """Per-point tangent direction c [rows list], u coefficient, source term.

    like: an [1, T] array for broadcasting shapes.  MOR rows (trailing
    n_mor inputs) get a ZERO direction: the weak form never differentiates
    in mu, so the directional derivative simply ignores those inputs
    (SURVEY.md §3.5 — this is what admits parametric problems here).
    """
    n_q = tab_ref[q, 0]
    w_q = tab_ref[q, 1]
    kappa = f_ref[0:1, :]
    c_rows = []
    for j in range(d):
        vel_j = f_ref[1 + j : 2 + j, :]
        dn_qj = tab_ref[q, 2 + j]
        c_rows.append(w_q * scale_ref[j, 0] * (vel_j * n_q + kappa * dn_qj))
    if td:
        c_rows.append(w_q * scale_ref[d, 0] * n_q * jnp.ones_like(like))
    for _ in range(n_mor):
        c_rows.append(jnp.zeros_like(like))
    cu = None
    if has_react:
        react = f_ref[2 + d : 3 + d, :]
        cu = w_q * n_q * react
    src = f_ref[1 + d : 2 + d, :]
    return c_rows, cu, -w_q * n_q * src


def _embed_dir(xs, c_rows, bt, n_in):
    """Fourier layer-0 operands for the directional kernel.

    bt = 2*pi*B^T [F, n_in] (fixed, non-trainable).  Returns
    a0 = [sin | cos](bt @ xs)  [2F, T]   — the embedded input, and
    d0 = dphi(xs) . c          [2F, T]   — its directional tangent, the
    contraction of the embedding jacobian (cf. pallas_mlp._embed, which
    seeds FULL per-coordinate panels) with the weak-form direction c.
    Both consume SCALED inputs; the input scale stays folded into c by
    _dir_coeffs exactly as in the plain path."""
    c = jnp.concatenate(c_rows, axis=0)  # [n_in, T]
    ang = _small_k_mm(bt, xs, n_in)      # [F, T]
    pc = _small_k_mm(bt, c, n_in)        # [F, T]
    sn, cs = jnp.sin(ang), jnp.cos(ang)
    a0 = jnp.concatenate([sn, cs], axis=0)
    d0 = jnp.concatenate([cs * pc, -sn * pc], axis=0)
    return a0, d0


def _dir_layer0(_mm, n_in, n_ff, w_refs, xs, c_rows, bt_ref):
    """Layer-0 pre-activations (z, jpre0) plus the effective layer-0 input
    pair (x0, t0) the backward contracts weight gradients against: the
    embedded (a0, d0) under Fourier features, raw (xs, c) otherwise."""
    if n_ff:
        a0, d0 = _embed_dir(xs, c_rows, bt_ref[:], n_in)
        z = _mm(w_refs[0][:], a0) + w_refs[1][:]
        jpre0 = _mm(w_refs[0][:], d0)
        return z, jpre0, a0, d0
    c = jnp.concatenate(c_rows, axis=0)  # [n_in, T]
    z = _small_k_mm(w_refs[0][:], xs, n_in) + w_refs[1][:]
    jpre0 = _small_k_mm(w_refs[0][:], c, n_in)  # [H, T]
    return z, jpre0, xs, c


def _dir_forward_from(_mm, act, act_p, n_layers, w_refs, z, jpre0, t):
    """2-panel packed forward from layer-0 pre-activations: s = [a | tangent].
    Returns (u, dd, s_packed, zs, acts, jpre0) — jpre0 is the layer-1
    tangent pre-activation (needed by the backward's gz term)."""
    a = act(z)
    sp = act_p(z, a)
    s = jnp.concatenate([a, sp * jpre0], axis=1)  # [H, 2T]
    zs, acts, s_packed = [z], [a], [s]
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        zc = _mm(wt, s)
        z = zc[:, :t] + b
        a = act(z)
        sp = act_p(z, a)
        s = jnp.concatenate([a, sp * zc[:, t:]], axis=1)
        zs.append(z)
        acts.append(a)
        s_packed.append(s)
    wt, b = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    oc = _mm(wt, s)
    u = oc[:, :t] + b
    dd = oc[:, t:]
    return u, dd, s_packed, zs, acts, jpre0


def _dir_fwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                    n_ff, *refs):
    """refs: xs [n_in,T], f [n_f,T], tab (SMEM), scale (SMEM)[, bt [F,n_in]
    when n_ff > 0], Wt/b, r [1,T]."""
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref = refs[:4]
    base = 5 if n_ff else 4
    bt_ref = refs[4] if n_ff else None
    w_refs = refs[base : base + 2 * n_layers]
    r_ref = refs[base + 2 * n_layers]
    t = xs_ref.shape[1]
    q = pl.program_id(1)

    c_rows, cu, c_src = _dir_coeffs(
        f_ref, tab_ref, scale_ref, q, d, td, has_react, f_ref[0:1, :],
        n_mor=n_in - d - (1 if td else 0),
    )
    z, jpre0, _, _ = _dir_layer0(_mm, n_in, n_ff, w_refs, xs_ref[:], c_rows,
                                 bt_ref)
    u, dd, _, _, _, _ = _dir_forward_from(
        _mm, act, act_p, n_layers, w_refs, z, jpre0, t
    )
    contrib = dd + c_src
    if cu is not None:
        contrib = contrib + cu * u

    @pl.when(q == 0)
    def _():
        r_ref[:] = contrib

    @pl.when(q != 0)
    def _():
        r_ref[:] = r_ref[:] + contrib


def _dir_bwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                    n_ff, *refs):
    """refs: xs, f, tab, scale[, bt], gr [1,T], Wt/b pairs, outs dWt/db."""
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref = refs[:4]
    base = 5 if n_ff else 4
    bt_ref = refs[4] if n_ff else None
    gr_ref = refs[base]
    w_refs = refs[base + 1 : base + 1 + 2 * n_layers]
    out_refs = refs[base + 1 + 2 * n_layers :]
    t = xs_ref.shape[1]
    i = pl.program_id(0)
    q = pl.program_id(1)
    xs = xs_ref[:]

    c_rows, cu, _ = _dir_coeffs(
        f_ref, tab_ref, scale_ref, q, d, td, has_react, f_ref[0:1, :],
        n_mor=n_in - d - (1 if td else 0),
    )
    z0, jp0, x0, t0 = _dir_layer0(_mm, n_in, n_ff, w_refs, xs, c_rows, bt_ref)
    u, dd, s_packed, zs, acts, jpre0 = _dir_forward_from(
        _mm, act, act_p, n_layers, w_refs, z0, jp0, t
    )
    del u, dd
    gr = gr_ref[:]
    g_val = gr * cu if cu is not None else None  # value-row cotangent
    g_tan = gr                                   # tangent row IS the contrib

    def accum(ref, val):
        @pl.when((i == 0) & (q == 0))
        def _():
            ref[:] = val

        @pl.when((i != 0) | (q != 0))
        def _():
            ref[:] = ref[:] + val

    wt_last = w_refs[2 * (n_layers - 1)][:]
    d_wt_last = _mm(g_tan, s_packed[-1][:, t:].T)
    if g_val is not None:
        d_wt_last = d_wt_last + _mm(g_val, s_packed[-1][:, :t].T)
    accum(out_refs[2 * (n_layers - 1)], d_wt_last)
    accum(
        out_refs[2 * (n_layers - 1) + 1],
        jnp.sum(g_val, axis=1, keepdims=True)
        if g_val is not None
        else jnp.zeros_like(w_refs[2 * (n_layers - 1) + 1][:]),
    )
    zero_val = g_val is None
    g_s = jnp.concatenate(
        [
            _outer(wt_last.T, g_val) if not zero_val
            else jnp.zeros((wt_last.shape[1], t), jnp.float32),
            _outer(wt_last.T, g_tan),
        ],
        axis=1,
    )  # [H, 2T]

    for l in range(n_layers - 2, -1, -1):
        sp = act_p(zs[l], acts[l])
        spp = act_pp(zs[l], acts[l], sp)
        ga = g_s[:, :t]
        g_jac = g_s[:, t:]
        pre = jpre0 if l == 0 else _mm(
            w_refs[2 * l][:], s_packed[l - 1][:, t:]
        )
        gz = sp * ga + spp * (g_jac * pre)
        g_p = sp * g_jac
        if l == 0:
            if n_ff:
                # embedded inputs: full matmuls against a0/d0 (B is fixed,
                # so parameter gradients stop at the first weight)
                d_wt = _mm(gz, x0.T) + _mm(g_p, t0.T)
            else:
                d_wt = _small_n_mm_t(gz, x0, n_in) + _small_n_mm_t(
                    g_p, t0, n_in
                )
            accum(out_refs[0], d_wt)
            accum(out_refs[1], jnp.sum(gz, axis=1, keepdims=True))
        else:
            g_zc = jnp.concatenate([gz, g_p], axis=1)
            accum(out_refs[2 * l], _mm(g_zc, s_packed[l - 1].T))
            accum(out_refs[2 * l + 1], jnp.sum(gz, axis=1, keepdims=True))
            g_s = _mm(w_refs[2 * l][:].T, g_zc)


def resolve_layout(h_max, nq, n_layers, n_in, activation="tanh",
                   directional=True, interpret=False, tile=None,
                   q_block=None, precision=None, n_ff=0):
    """(G, tile) the fused-residual dispatcher will use — exposed so the
    trainer can PRECOMPUTE the kernel's data layout once (see
    prepare_residual_layout) with guaranteed-matching parameters.

    VMEM calibration (measured on v5e, default bf16-pass precision):
    the doubled-budget envelope is G*h <= 80 for tanh/sigmoid
    (G=4/h=80/tile-4096 runs; G=2/h=96 OOM'd scoped VMEM 26.3M/16M).
    Under HIGHEST precision the f32 multi-pass matmuls add scratch
    (width 48/tile 3456 OOM'd 19.06M/16M); q-block auto then stays at
    the proven G=1 and the budget shrinks 0.75x (width 32/tile 5120 at
    HIGHEST is a measured-good round-2 point; the 0.75 cap keeps it
    under that)."""
    highest = precision in ("highest", "float32") or (
        precision is not None and "HIGHEST" in str(precision)
    )
    if q_block is None:
        q_block = 1
        if directional and not interpret and not highest and not n_ff:
            for g_try in (4, 2):
                if g_try * h_max <= 80 and nq % g_try == 0:
                    q_block = g_try
                    break
    G = int(q_block)
    if n_ff and G != 1:
        raise ValueError("fourier_bt requires q_block == 1")
    if tile is None:
        tile = DEFAULT_TILE_K_DIR if directional else DEFAULT_TILE_K
    eff_in = 1 if directional else n_in
    from .pallas_mlp import _VMEM_BUDGET_BYTES, _auto_tile

    if n_ff:
        # Fourier path: the embedded a0/d0 panels ([2F, T] each) stay live
        # through the whole backward, like one extra layer of width 2F;
        # budget stays at the default (the doubled-budget envelope below
        # was measured for the plain kernels only).
        h_eff = max(h_max, 2 * n_ff)
        layers_eff = n_layers + 1
    else:
        h_eff, layers_eff = h_max, n_layers
    if highest:
        budget = (3 * _VMEM_BUDGET_BYTES) // 4
    elif (directional and activation in ("tanh", "sigmoid")
          and G * h_max <= 80 and not n_ff):
        # tanh/sigmoid never read the retained pre-activation panels, so
        # within the measured envelope the effective budget doubles
        budget = 2 * _VMEM_BUDGET_BYTES
    else:
        budget = None  # _auto_tile default
    tile = _auto_tile(tile, G * h_eff, layers_eff, eff_in,
                      budget_bytes=budget)
    return G, tile


def _block_layout(xp, a3, nqp, kp, G):
    """The q-major G-blocked kernel layout, in ONE place (the kernels'
    col_map assumes exactly this transform): [rows, nqp, kp]-flattened
    a3 -> G = 1: [rows, nqp * kp]; G > 1: [G * rows, (nqp // G) * kp]
    with the within-block q index leading the row axis."""
    rows = a3.shape[0]
    if G > 1:
        a = a3.reshape(rows, nqp // G, G, kp)
        return xp.transpose(a, (2, 0, 1, 3)).reshape(
            G * rows, (nqp // G) * kp
        )
    return a3.reshape(rows, nqp * kp)


def prepare_residual_layout(quad, scale, shift, *, has_react, G, tile):
    """Precompute the kernel's q-major (optionally q-blocked) data layout
    (xs, flds) for FIXED quadrature data.

    The layout transform (transpose + pad + block-reshape of ~130 MB at
    bench size) is theta-independent; done in-graph it re-executes every
    step (~10% of the step).  The trainer calls this ONCE per shard at
    setup and threads the result through the jitted step (the `prepared`
    argument of pallas_fused_residual).  Works on NumPy or device arrays;
    returns jnp arrays.
    """
    # NumPy inputs stay on host (the trainer precomputes per-shard
    # layouts there); device arrays go through jnp.  Coords are cast to
    # f32 BEFORE scaling so both paths round identically.
    xp = np if isinstance(quad.coords, np.ndarray) else jnp
    if quad.tables_per_node:
        # [K, nQ(, d)] order-2 tables: the plain fused layout assumes the
        # shared [nQ(, d)] shape (d below would silently become nQ) —
        # order-2 rides prepare_residual_coeffs (precoeff=True) instead.
        raise ValueError(
            "per-node test tables (test_order=2) require precoeff=True"
        )
    k, nq, n_in = quad.coords.shape
    d = quad.dN.shape[-1]
    kp = _round_up(max(k, 1), tile)
    nqp = _round_up(nq, G)

    flat = xp.asarray(quad.coords, dtype=xp.float32)
    if scale is not None:
        flat = (flat - xp.asarray(shift, dtype=xp.float32)) * xp.asarray(
            scale, dtype=xp.float32
        )
    xs3 = xp.transpose(flat, (2, 1, 0))
    xs3 = xp.pad(xs3, ((0, 0), (0, nqp - nq), (0, kp - k)))

    def row3(a):
        a = xp.transpose(xp.asarray(a, dtype=xp.float32))[None]
        return xp.pad(a, ((0, 0), (0, nqp - nq), (0, kp - k)))

    fld_rows = [row3(quad.kappa)]
    fld_rows += [row3(quad.vel[:, :, j]) for j in range(d)]
    fld_rows += [row3(quad.src)]
    if has_react:
        fld_rows += [row3(quad.react)]
    flds3 = xp.concatenate(fld_rows, axis=0)
    n_f = flds3.shape[0]

    return (_block_layout(xp, xs3, nqp, kp, G),
            _block_layout(xp, flds3, nqp, kp, G))


@functools.lru_cache(maxsize=32)
def _fused_residual_fn(n_in, n_layers, d, td, has_react, activation, tile,
                       nq, interpret, precision=None, directional=True,
                       n_ff=0, nl=None):
    n_f = 1 + d + 1 + (1 if has_react else 0)  # kappa, vel, src[, react]

    def make_call(kernel, extra_kinds, out_specs, out_shape):
        # extra_kinds: per extra operand, "full" = whole-array block
        # (e.g. the Fourier bt matrix), "tile" = [1, tile] column block
        # indexed by i (the residual cotangent gr in the backward).
        def call(wts, bs, xs, f, tab, scale, *extra):
            kp = xs.shape[1] // nq
            n_i = kp // tile
            grid = (n_i, nq)

            def col_map(i, q):
                # column block: q-major layout, K-padded columns per q
                return (0, q * n_i + i)

            in_specs = [
                pl.BlockSpec((n_in, tile), col_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((n_f, tile), col_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(tab.shape, lambda i, q: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(scale.shape, lambda i, q: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
            for a, kind in zip(extra, extra_kinds):
                if kind == "full":
                    in_specs.append(
                        pl.BlockSpec(a.shape, lambda i, q: (0, 0),
                                     memory_space=pltpu.VMEM)
                    )
                else:
                    in_specs.append(
                        pl.BlockSpec((1, tile), lambda i, q: (0, i),
                                     memory_space=pltpu.VMEM)
                    )
            wb = []
            for wt, b in zip(wts, bs):
                wb += [wt, b]
                in_specs += [
                    pl.BlockSpec(wt.shape, lambda i, q: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(b.shape, lambda i, q: (0, 0),
                                 memory_space=pltpu.VMEM),
                ]
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs(wts, bs, kp),
                out_shape=out_shape(wts, bs, kp),
                interpret=interpret,
            )(xs, f, tab, scale, *extra, *wb)

        return call

    if n_ff and not directional:
        raise ValueError("n_ff > 0 requires directional=True")
    if nl is not None and directional:
        raise ValueError("nl (nonlinear advection) requires the "
                         "jacobian-panel kernel (directional=False)")
    dir_extra = (n_ff,) if directional else (nl,)
    fwd_kernel = functools.partial(
        _dir_fwd_kernel if directional else _fused_fwd_kernel,
        n_in, n_layers, d, td, has_react, activation, precision, *dir_extra,
    )
    bwd_kernel = functools.partial(
        _dir_bwd_kernel if directional else _fused_bwd_kernel,
        n_in, n_layers, d, td, has_react, activation, precision, *dir_extra,
    )

    ff_kinds = ("full",) if n_ff else ()
    fwd_call = make_call(
        fwd_kernel, extra_kinds=ff_kinds,
        out_specs=lambda wts, bs, kp: pl.BlockSpec(
            (1, tile), lambda i, q: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=lambda wts, bs, kp: jax.ShapeDtypeStruct((1, kp), jnp.float32),
    )

    def bwd_out_specs(wts, bs, kp):
        specs = []
        for wt, b in zip(wts, bs):
            specs += [
                pl.BlockSpec(wt.shape, lambda i, q: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(b.shape, lambda i, q: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        return specs

    def bwd_out_shape(wts, bs, kp):
        shapes = []
        for wt, b in zip(wts, bs):
            shapes += [
                jax.ShapeDtypeStruct(wt.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.shape, jnp.float32),
            ]
        return shapes

    bwd_call = make_call(bwd_kernel, extra_kinds=ff_kinds + ("tile",),
                         out_specs=bwd_out_specs, out_shape=bwd_out_shape)

    if n_ff:
        @jax.custom_vjp
        def f(wts, bs, xs, flds, tab, scale, bt):
            return fwd_call(wts, bs, xs, flds, tab, scale, bt)

        def f_fwd(wts, bs, xs, flds, tab, scale, bt):
            return (f(wts, bs, xs, flds, tab, scale, bt),
                    (wts, bs, xs, flds, tab, scale, bt))

        def f_bwd(res, gr):
            wts, bs, xs, flds, tab, scale, bt = res
            grads = bwd_call(wts, bs, xs, flds, tab, scale, bt, gr)
            d_wts = tuple(grads[2 * l] for l in range(n_layers))
            d_bs = tuple(grads[2 * l + 1] for l in range(n_layers))
            return (d_wts, d_bs, jnp.zeros_like(xs), jnp.zeros_like(flds),
                    jnp.zeros_like(tab), jnp.zeros_like(scale),
                    jnp.zeros_like(bt))

        f.defvjp(f_fwd, f_bwd)
        return f

    @jax.custom_vjp
    def f(wts, bs, xs, flds, tab, scale):
        return fwd_call(wts, bs, xs, flds, tab, scale)

    def f_fwd(wts, bs, xs, flds, tab, scale):
        return f(wts, bs, xs, flds, tab, scale), (wts, bs, xs, flds, tab, scale)

    def f_bwd(res, gr):
        wts, bs, xs, flds, tab, scale = res
        grads = bwd_call(wts, bs, xs, flds, tab, scale, gr)
        d_wts = tuple(grads[2 * l] for l in range(n_layers))
        d_bs = tuple(grads[2 * l + 1] for l in range(n_layers))
        return (d_wts, d_bs, jnp.zeros_like(xs), jnp.zeros_like(flds),
                jnp.zeros_like(tab), jnp.zeros_like(scale))

    f.defvjp(f_fwd, f_bwd)
    return f


# ---------------------------------------------------------------------- #
# Q-BLOCKED directional variant (round 3): the directional kernel's hidden
# matmuls are [H, H] @ [H, 2T] with H ~ 20 — the MXU's 128 sublane rows are
# ~84% idle and throughput is bound by COLUMN PASSES, not FLOPs (measured:
# width 20 -> 48 is 5.7x the FLOPs for ~1.27x the time, BASELINE.md).  Here
# G quadrature points share one program: their states stack along the
# sublane axis ([G*H, 2T]) and the hidden weights become BLOCK-DIAGONAL
# [G*H, G*H] matrices (same pass cost as [H, H] for G*H <= 128), cutting
# MXU passes per point by ~G.  The output layer's block form [G, G*H] also
# SUMS the G contributions for free via the final contraction row layout.
# Per-q work that must stay per-q (layer-0 small-K products, coefficient
# construction) loops over compile-time g with row slices.
#
# Parameter gradients accumulate in BLOCKED shapes in-kernel (the MXU
# produces [G*H, G*H] including garbage off-diagonal blocks — one pass,
# harmless); the XLA-side wrapper sums the G diagonal blocks, which is the
# correct gradient because every block is the SAME parameter.


def _dirq_coeffs(f_ref, tab_ref, scale_ref, qg, d, td, has_react, n_in,
                 n_f, G):
    """Blocked per-point coefficients for q = qg*G + g, g = 0..G-1.

    Returns (c_blk [G*n_in, T], cu_blk [G, T] or None, csrc_blk [G, T]).
    Padded q rows (beyond the real nq) carry w_q = 0 in the table, zeroing
    every coefficient, so garbage columns contribute exactly 0."""
    n_mor = n_in - d - (1 if td else 0)
    c_parts, cu_parts, csrc_parts = [], [], []
    for g in range(G):
        fg = f_ref[g * n_f : (g + 1) * n_f, :]
        c_rows, cu, csrc = _dir_coeffs(
            fg, tab_ref, scale_ref, qg * G + g, d, td, has_react,
            fg[0:1, :], n_mor=n_mor,
        )
        c_parts.extend(c_rows)
        if cu is not None:
            cu_parts.append(cu)
        csrc_parts.append(csrc)
    c_blk = jnp.concatenate(c_parts, axis=0)
    cu_blk = jnp.concatenate(cu_parts, axis=0) if cu_parts else None
    csrc_blk = jnp.concatenate(csrc_parts, axis=0)
    return c_blk, cu_blk, csrc_blk


def _dirq_forward(_mm, act, act_p, n_in, n_layers, G, w_refs, xs, c_blk, t):
    """Blocked 2-panel forward.  w_refs layout: [w0 core [H0,n_in], b0,
    (wblk_l [G*Hl,G*Hl-1], b_l)…, wlast_blk [G,G*Hlast], b_last].
    Returns (u [G,T], dd [G,T], s_packed, zs, acts, jpre0)."""
    w0, b0 = w_refs[0][:], w_refs[1][:]
    zg, jg = [], []
    for g in range(G):
        xg = xs[g * n_in : (g + 1) * n_in, :]
        cg = c_blk[g * n_in : (g + 1) * n_in, :]
        zg.append(_small_k_mm(w0, xg, n_in) + b0)
        jg.append(_small_k_mm(w0, cg, n_in))
    z = jnp.concatenate(zg, axis=0)        # [G*H0, T]
    jpre0 = jnp.concatenate(jg, axis=0)    # [G*H0, T]
    a = act(z)
    sp = act_p(z, a)
    s = jnp.concatenate([a, sp * jpre0], axis=1)  # [G*H0, 2T]
    zs, acts, s_packed = [z], [a], [s]
    for l in range(1, n_layers - 1):
        wblk, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        zc = _mm(wblk, s)
        bt = jnp.concatenate([b] * G, axis=0)
        z = zc[:, :t] + bt
        a = act(z)
        sp = act_p(z, a)
        s = jnp.concatenate([a, sp * zc[:, t:]], axis=1)
        zs.append(z)
        acts.append(a)
        s_packed.append(s)
    wlast, blast = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    oc = _mm(wlast, s)                     # [G, 2T]
    u = oc[:, :t] + blast                  # bias broadcasts over G rows
    dd = oc[:, t:]
    return u, dd, s_packed, zs, acts, jpre0


def _dirq_fwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                     G, n_f, *refs):
    """refs: xs [G*n_in,T], f [G*n_f,T], tab SMEM [nqp,2+d], scale SMEM,
    w/b per layer (see _dirq_forward), out r [1,T]."""
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_layers]
    r_ref = refs[4 + 2 * n_layers]
    t = xs_ref.shape[1]
    qg = pl.program_id(1)

    c_blk, cu_blk, csrc_blk = _dirq_coeffs(
        f_ref, tab_ref, scale_ref, qg, d, td, has_react, n_in, n_f, G,
    )
    u, dd, _, _, _, _ = _dirq_forward(
        _mm, act, act_p, n_in, n_layers, G, w_refs, xs_ref[:], c_blk, t
    )
    per_g = dd + csrc_blk
    if cu_blk is not None:
        per_g = per_g + cu_blk * u
    contrib = jnp.sum(per_g, axis=0, keepdims=True)  # [1, T]

    @pl.when(qg == 0)
    def _():
        r_ref[:] = contrib

    @pl.when(qg != 0)
    def _():
        r_ref[:] = r_ref[:] + contrib


def _dirq_bwd_kernel(n_in, n_layers, d, td, has_react, activation, precision,
                     G, n_f, *refs):
    """refs: xs, f, tab, scale, gr [1,T], wl_col [Hlast,1], w/b pairs,
    outs: d_w0 [H0,n_in], d_b0 [G*H0,1], (d_wblk_l [G*Hl,G*Hl-1],
    d_b_l [G*Hl,1])…, d_wlast_blk [G,G*Hlast], d_blast [1,1].
    Blocked grads are diagonal-summed by the XLA wrapper."""
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, f_ref, tab_ref, scale_ref, gr_ref, wl_col_ref = refs[:6]
    w_refs = refs[6 : 6 + 2 * n_layers]
    out_refs = refs[6 + 2 * n_layers :]

    c_blk, cu_blk, _ = _dirq_coeffs(
        f_ref, tab_ref, scale_ref, pl.program_id(1), d, td, has_react, n_in,
        n_f, G,
    )
    _dir_blocked_bwd(_mm, act, act_p, act_pp, n_in, n_layers, G, w_refs,
                     out_refs, xs_ref[:], c_blk, cu_blk, gr_ref[:],
                     wl_col_ref[:])


def _dir_blocked_bwd(_mm, act, act_p, act_pp, n_in, n_layers, G, w_refs,
                     out_refs, xs, c_blk, cu_blk, gr, wl_col):
    """Shared backward body of the blocked directional kernels (_dirq /
    _dirp): recompute the forward state, then accumulate BLOCKED parameter
    gradients into ``out_refs`` across the (i, qg) grid.  The two callers
    differ only in where the contraction direction ``c_blk`` and reaction
    row ``cu_blk`` come from (in-kernel table work vs precomputed
    operands)."""
    t = xs.shape[1]
    i = pl.program_id(0)
    qg = pl.program_id(1)
    u, dd, s_packed, zs, acts, jpre0 = _dirq_forward(
        _mm, act, act_p, n_in, n_layers, G, w_refs, xs, c_blk, t
    )
    del u, dd
    g_tan = jnp.concatenate([gr] * G, axis=0)       # [G, T]
    g_val = gr * cu_blk if cu_blk is not None else None

    def accum(ref, val):
        @pl.when((i == 0) & (qg == 0))
        def _():
            ref[:] = val

        @pl.when((i != 0) | (qg != 0))
        def _():
            ref[:] = ref[:] + val

    d_wlast = _mm(g_tan, s_packed[-1][:, t:].T)     # [G, G*Hlast]
    if g_val is not None:
        d_wlast = d_wlast + _mm(g_val, s_packed[-1][:, :t].T)
    accum(out_refs[2 * (n_layers - 1)], d_wlast)
    accum(
        out_refs[2 * (n_layers - 1) + 1],
        jnp.sum(g_val, keepdims=True).reshape(1, 1)
        if g_val is not None
        else jnp.zeros((1, 1), jnp.float32),
    )

    tan_row = _outer(wl_col, gr)                    # same for every g
    tan_panel = jnp.concatenate([tan_row] * G, axis=0)
    if g_val is not None:
        val_panel = jnp.concatenate(
            [_outer(wl_col, g_val[g : g + 1, :]) for g in range(G)], axis=0
        )
    else:
        val_panel = jnp.zeros_like(tan_panel)
    g_s = jnp.concatenate([val_panel, tan_panel], axis=1)  # [G*Hlast, 2T]

    for l in range(n_layers - 2, -1, -1):
        sp = act_p(zs[l], acts[l])
        spp = act_pp(zs[l], acts[l], sp)
        ga = g_s[:, :t]
        g_jac = g_s[:, t:]
        pre = jpre0 if l == 0 else _mm(
            w_refs[2 * l][:], s_packed[l - 1][:, t:]
        )
        gz = sp * ga + spp * (g_jac * pre)
        g_p = sp * g_jac
        if l == 0:
            h0 = gz.shape[0] // G
            acc_w = None
            for g in range(G):
                gzg = gz[g * h0 : (g + 1) * h0, :]
                gpg = g_p[g * h0 : (g + 1) * h0, :]
                xg = xs[g * n_in : (g + 1) * n_in, :]
                cg = c_blk[g * n_in : (g + 1) * n_in, :]
                term = _small_n_mm_t(gzg, xg, n_in) + _small_n_mm_t(
                    gpg, cg, n_in
                )
                acc_w = term if acc_w is None else acc_w + term
            accum(out_refs[0], acc_w)
            accum(out_refs[1], jnp.sum(gz, axis=1, keepdims=True))
        else:
            g_zc = jnp.concatenate([gz, g_p], axis=1)
            accum(out_refs[2 * l], _mm(g_zc, s_packed[l - 1].T))
            accum(out_refs[2 * l + 1], jnp.sum(gz, axis=1, keepdims=True))
            g_s = _mm(w_refs[2 * l][:].T, g_zc)


def _blocked_weight_ops(wts, bs, n_layers, G):
    """Core param pytree -> blocked kernel weight operand list (XLA-side,
    per call — tiny arrays, fused into the surrounding graph)."""
    eye = jnp.eye(G, dtype=jnp.float32)
    ops = [wts[0], jnp.reshape(bs[0], (-1, 1))]
    for l in range(1, n_layers - 1):
        ops += [jnp.kron(eye, wts[l]), jnp.reshape(bs[l], (-1, 1))]
    ops += [jnp.kron(eye, wts[-1]), jnp.reshape(bs[-1], (1, 1))]
    return ops


def _blocked_bwd_shapes(wts, n_in, n_layers, G):
    """Shapes of the BLOCKED gradient outputs of ``_dir_blocked_bwd``."""
    shapes = [(wts[0].shape[0], n_in), (G * wts[0].shape[0], 1)]
    for l in range(1, n_layers - 1):
        shapes += [
            (G * wts[l].shape[0], G * wts[l].shape[1]),
            (G * wts[l].shape[0], 1),
        ]
    shapes += [(G, G * wts[-1].shape[1]), (1, 1)]
    return shapes


def _reduce_blocked_grads(grads, wts, n_layers, G):
    """Sum the G parameter copies of blocked gradients back to core
    shapes (every diagonal block is the SAME parameter)."""
    d_wts, d_bs = [], []
    # layer 0: weight already core; bias is [G*H0, 1]
    d_wts.append(grads[0])
    h0 = wts[0].shape[0]
    d_bs.append(jnp.sum(grads[1].reshape(G, h0), axis=0)[:, None])
    idx = 2
    for l in range(1, n_layers - 1):
        ho, hi = wts[l].shape
        blk = grads[idx].reshape(G, ho, G, hi)
        # diagonal blocks blk[g, :, g, :] summed over g
        d_wts.append(jnp.sum(blk[jnp.arange(G), :, jnp.arange(G), :], axis=0))
        d_bs.append(jnp.sum(grads[idx + 1].reshape(G, ho), axis=0)[:, None])
        idx += 2
    hl = wts[-1].shape[1]
    blk_last = grads[idx].reshape(G, G, hl)
    d_wts.append(jnp.sum(blk_last[jnp.arange(G), jnp.arange(G), :],
                         axis=0)[None, :])
    d_bs.append(jnp.reshape(grads[idx + 1], (1, 1)))
    return tuple(d_wts), tuple(d_bs)


@functools.lru_cache(maxsize=32)
def _dirq_residual_fn(n_in, n_layers, d, td, has_react, activation, tile,
                      nqp, G, interpret, precision=None):
    """Q-blocked directional kernel factory.  nqp = padded (G-divisible)
    quadrature count; the q-major column layout groups G consecutive q's
    per program."""
    n_f = 1 + d + 1 + (1 if has_react else 0)
    n_qg = nqp // G

    def make_call(kernel, extra_in, out_specs, out_shape):
        def call(wts, bs, xs, f, tab, scale, *extra):
            kp = xs.shape[1] // n_qg
            n_i = kp // tile
            grid = (n_i, n_qg)

            def col_map(i, qg):
                return (0, qg * n_i + i)

            in_specs = [
                pl.BlockSpec((G * n_in, tile), col_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * n_f, tile), col_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tab.shape, lambda i, qg: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(scale.shape, lambda i, qg: (0, 0),
                             memory_space=pltpu.SMEM),
            ]
            if extra_in:  # gr cotangent + wl_col (backward only)
                in_specs.append(
                    pl.BlockSpec((1, tile), lambda i, qg: (0, i),
                                 memory_space=pltpu.VMEM)
                )
            ops = _blocked_weight_ops(wts, bs, n_layers, G)
            if extra_in:
                wl_col = jnp.transpose(wts[-1])  # [Hlast, 1]
                ops = [wl_col] + ops
                in_specs.append(
                    pl.BlockSpec(wl_col.shape, lambda i, qg: (0, 0),
                                 memory_space=pltpu.VMEM)
                )
                extra = (*extra, ops[0])
                ops = ops[1:]
            for op in ops:
                in_specs.append(
                    pl.BlockSpec(op.shape, lambda i, qg: (0, 0),
                                 memory_space=pltpu.VMEM)
                )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs(wts, bs, kp),
                out_shape=out_shape(wts, bs, kp),
                interpret=interpret,
            )(xs, f, tab, scale, *extra, *ops)

        return call

    fwd_kernel = functools.partial(
        _dirq_fwd_kernel, n_in, n_layers, d, td, has_react, activation,
        precision, G, n_f,
    )
    bwd_kernel = functools.partial(
        _dirq_bwd_kernel, n_in, n_layers, d, td, has_react, activation,
        precision, G, n_f,
    )

    fwd_call = make_call(
        fwd_kernel, extra_in=False,
        out_specs=lambda wts, bs, kp: pl.BlockSpec(
            (1, tile), lambda i, qg: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=lambda wts, bs, kp: jax.ShapeDtypeStruct((1, kp), jnp.float32),
    )

    def bwd_out_specs(wts, bs, kp):
        return [
            pl.BlockSpec(s, lambda i, qg: (0, 0), memory_space=pltpu.VMEM)
            for s in _blocked_bwd_shapes(wts, n_in, n_layers, G)
        ]

    def bwd_out_shape(wts, bs, kp):
        return [jax.ShapeDtypeStruct(s, jnp.float32)
                for s in _blocked_bwd_shapes(wts, n_in, n_layers, G)]

    bwd_call = make_call(bwd_kernel, extra_in=True,
                         out_specs=bwd_out_specs, out_shape=bwd_out_shape)

    @jax.custom_vjp
    def f(wts, bs, xs, flds, tab, scale):
        return fwd_call(wts, bs, xs, flds, tab, scale)

    def f_fwd(wts, bs, xs, flds, tab, scale):
        return f(wts, bs, xs, flds, tab, scale), (wts, bs, xs, flds, tab, scale)

    def f_bwd(res, gr):
        wts, bs, xs, flds, tab, scale = res
        grads = bwd_call(wts, bs, xs, flds, tab, scale, gr)
        d_wts, d_bs = _reduce_blocked_grads(grads, wts, n_layers, G)
        return (d_wts, d_bs, jnp.zeros_like(xs), jnp.zeros_like(flds),
                jnp.zeros_like(tab), jnp.zeros_like(scale))

    f.defvjp(f_fwd, f_bwd)
    return f


# ---------------------------------------------------------------------- #
# PRECOMPUTED-COEFFICIENT directional variant (round 3): _dir_coeffs is
# theta-INDEPENDENT — every coefficient is a closed form of the fixed
# data (w_q, N_q, dN_q, kappa, vel, src, react) and the input scaling.
# This variant moves the whole coefficient construction into the one-time
# data preparation (prepare_residual_coeffs): the kernel receives the
# final per-(k, q) tangent direction cdir, source term csrc, and reaction
# coefficient cu as plain data operands and does NO table work at all —
# no SMEM lookups, no per-g coefficient assembly, no unaligned row
# concats.  Data volume is unchanged (n_in + 1 (+1) coefficient rows
# replace the 2 + d (+1) field rows AND the SMEM table).
#
# This is also the ONLY kernel layout that admits PER-NODE test tables
# (the order-2 quadratic test space, fem/element.py): coefficients are
# per (k, q) by construction, so shared [nQ] and per-node [K, nQ] tables
# prepare into the identical operand format.


def _pad_hidden_widths(params, multiple: int = 8):
    """Zero-pad every hidden width to a multiple of ``multiple``.

    Exact: padded weight rows/cols and bias entries are zero, so padded
    units output act(0) scaled by zero downstream weights; gradients of
    the ORIGINAL parameters are untouched because the pad is a traced op
    (its transpose slices the padding away)."""
    widths = [l["w"].shape[1] for l in params[:-1]]
    padded = [_round_up(h, multiple) for h in widths]
    if padded == widths:
        return params
    out = []
    for i, l in enumerate(params):
        w, b = l["w"], l["b"]
        pad_out = (padded[i] - widths[i]) if i < len(widths) else 0
        pad_in = (padded[i - 1] - widths[i - 1]) if i > 0 else 0
        w = jnp.pad(w, ((0, pad_in), (0, pad_out)))
        b = jnp.pad(jnp.reshape(b, (-1,)), ((0, pad_out),)) if pad_out else b
        out.append({"w": w, "b": b})
    return out


def _dirp_fwd_kernel(n_in, n_layers, has_react, activation, precision, G,
                     *refs):
    """refs: xs [G*n_in,T], cdir [G*n_in,T], csrc [G,T][, cu [G,T]],
    w/b per layer (blocked, as _dirq), out r [1,T]."""
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref, cdir_ref, csrc_ref = refs[:3]
    idx = 3
    cu_ref = None
    if has_react:
        cu_ref = refs[idx]
        idx += 1
    w_refs = refs[idx : idx + 2 * n_layers]
    r_ref = refs[idx + 2 * n_layers]
    t = xs_ref.shape[1]
    qg = pl.program_id(1)

    u, dd, _, _, _, _ = _dirq_forward(
        _mm, act, act_p, n_in, n_layers, G, w_refs, xs_ref[:], cdir_ref[:], t
    )
    per_g = dd + csrc_ref[:]
    if cu_ref is not None:
        per_g = per_g + cu_ref[:] * u
    contrib = jnp.sum(per_g, axis=0, keepdims=True)  # [1, T]

    @pl.when(qg == 0)
    def _():
        r_ref[:] = contrib

    @pl.when(qg != 0)
    def _():
        r_ref[:] = r_ref[:] + contrib


def _dirp_bwd_kernel(n_in, n_layers, has_react, activation, precision, G,
                     *refs):
    """refs: xs, cdir, csrc[, cu], gr [1,T], wl_col [Hlast,1], w/b pairs;
    outs as _dirq_bwd_kernel (blocked grads, diagonal-summed by the
    wrapper)."""
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, cdir_ref, _csrc_ref = refs[:3]
    idx = 3
    cu_ref = None
    if has_react:
        cu_ref = refs[idx]
        idx += 1
    gr_ref, wl_col_ref = refs[idx], refs[idx + 1]
    idx += 2
    w_refs = refs[idx : idx + 2 * n_layers]
    out_refs = refs[idx + 2 * n_layers :]

    _dir_blocked_bwd(_mm, act, act_p, act_pp, n_in, n_layers, G, w_refs,
                     out_refs, xs_ref[:], cdir_ref[:],
                     cu_ref[:] if cu_ref is not None else None, gr_ref[:],
                     wl_col_ref[:])


def prepare_residual_coeffs(quad, scale, shift, *, time_dependent,
                            has_react, G, tile, hard=None):
    """Precompute (xs, cdir, csrc[, cu]) for the precoeff kernel.

    Accepts shared [nQ] tables OR per-node [K, nQ] tables (order-2 test
    space) — the output format is identical.  Padded q rows / k columns
    are zero, so their contributions vanish in-kernel (coefficients are
    zero, not just weights).

    hard: optional :class:`~varnet_tpu.fem.hardbc.HardQuad` transform
    tables (exact BC/IC imposition).  The ansatz u = A + B*n makes the
    weak residual AFFINE in the raw network outputs (n, grad n, n_t), so
    exact imposition folds entirely into these coefficients and the
    unchanged kernel computes the transformed residual
    (DESIGN.md decision 18; the kernel does no extra work):

        grad-row j : w * sc_j * B * (vel_j N + kappa dN_j)
        time row   : w * sc_d * B * N
        cu (value) : w * (Bt N + (vel . dB) N + kappa dB . dN
                          [+ react B N])
        csrc       : w * ((At N + (vel . dA) N + kappa dA . dN
                          [+ react A N]) - src N)

    (steady problems drop the At/Bt terms; the theta-independent A-part
    rides the additive csrc operand, so no XLA-side offset is needed).
    A cu operand is always emitted in hard mode — pass the kernel
    factory ``has_react or hard`` as its cu flag.
    """
    xp = np if isinstance(quad.coords, np.ndarray) else jnp
    k, nq, n_in = quad.coords.shape
    d = quad.dN.shape[-1]
    td = bool(time_dependent)
    kp = _round_up(max(k, 1), tile)
    nqp = _round_up(nq, G)

    flat = xp.asarray(quad.coords, dtype=xp.float32)
    if scale is not None:
        flat = (flat - xp.asarray(shift, dtype=xp.float32)) * xp.asarray(
            scale, dtype=xp.float32
        )
    xs3 = xp.transpose(flat, (2, 1, 0))
    xs3 = xp.pad(xs3, ((0, 0), (0, nqp - nq), (0, kp - k)))

    def bc_kq(a):
        """Broadcast a table ([nQ] shared or [K, nQ] per-node) to [K, nQ]."""
        a = xp.asarray(a, dtype=xp.float32)
        if a.ndim == 1:
            a = xp.broadcast_to(a[None, :], (k, nq))
        return a

    n_kq = bc_kq(quad.N)
    w_kq = bc_kq(quad.w)
    dn_kq = xp.asarray(quad.dN, dtype=xp.float32)
    if dn_kq.ndim == 2:
        dn_kq = xp.broadcast_to(dn_kq[None, :, :], (k, nq, d))

    if scale is not None:
        sc = xp.reshape(xp.asarray(scale, dtype=xp.float32), (-1,))
    else:
        sc = xp.ones((n_in,), dtype=xp.float32)

    kappa = xp.asarray(quad.kappa, dtype=xp.float32)
    vel = xp.asarray(quad.vel, dtype=xp.float32)
    src = xp.asarray(quad.src, dtype=xp.float32)

    def row3(a_kq):
        a = xp.transpose(a_kq)[None]  # [1, nQ, K]
        return xp.pad(a, ((0, 0), (0, nqp - nq), (0, kp - k)))

    if hard is None:
        c_rows = [
            row3(w_kq * sc[j] * (vel[:, :, j] * n_kq
                                 + kappa * dn_kq[:, :, j]))
            for j in range(d)
        ]
        if td:
            c_rows.append(row3(w_kq * sc[d] * n_kq))
        csrc3 = row3(-w_kq * n_kq * src)            # [1, nQp, Kp]
        cu3 = None
        if has_react:
            react = xp.asarray(quad.react, dtype=xp.float32)
            cu3 = row3(w_kq * n_kq * react)
    else:
        # Hard-BC fold (u = A + B n): scale the grad/time rows by B, put
        # the n-coefficient on cu and the theta-independent A-part on the
        # additive csrc.  Tables arrive f64 host-side (fem/hardbc.py) or
        # as traced jnp arrays (in-graph fallback) — cast like the rest.
        B = xp.asarray(hard.B, dtype=xp.float32)
        dB = xp.asarray(hard.dB, dtype=xp.float32)
        dA = xp.asarray(hard.dA, dtype=xp.float32)
        c_rows = [
            row3(w_kq * sc[j] * B * (vel[:, :, j] * n_kq
                                     + kappa * dn_kq[:, :, j]))
            for j in range(d)
        ]
        if td:
            c_rows.append(row3(w_kq * sc[d] * B * n_kq))
        vdB = sum(vel[:, :, j] * dB[:, :, j] for j in range(d))
        kdBdN = sum(dB[:, :, j] * dn_kq[:, :, j] for j in range(d))
        vdA = sum(vel[:, :, j] * dA[:, :, j] for j in range(d))
        kdAdN = sum(dA[:, :, j] * dn_kq[:, :, j] for j in range(d))
        cu_kq = (vdB * n_kq + kappa * kdBdN)
        cs_kq = (vdA * n_kq + kappa * kdAdN - src * n_kq)
        if td:
            cu_kq = cu_kq + xp.asarray(hard.Bt, dtype=xp.float32) * n_kq
            cs_kq = cs_kq + xp.asarray(hard.At, dtype=xp.float32) * n_kq
        if has_react:
            react = xp.asarray(quad.react, dtype=xp.float32)
            A = xp.asarray(hard.A, dtype=xp.float32)
            cu_kq = cu_kq + react * B * n_kq
            cs_kq = cs_kq + react * A * n_kq
        cu3 = row3(w_kq * cu_kq)
        csrc3 = row3(w_kq * cs_kq)
    for _ in range(n_in - d - (1 if td else 0)):  # MOR rows: zero direction
        c_rows.append(xp.zeros((1, nqp, kp), dtype=xp.float32))
    cdir3 = xp.concatenate(c_rows, axis=0)          # [n_in, nQp, Kp]

    out = (_block_layout(xp, xs3, nqp, kp, G),
           _block_layout(xp, cdir3, nqp, kp, G),
           _block_layout(xp, csrc3, nqp, kp, G))
    if cu3 is not None:
        out = out + (_block_layout(xp, cu3, nqp, kp, G),)
    return out


@functools.lru_cache(maxsize=32)
def _dirp_residual_fn(n_in, n_layers, has_react, activation, tile, nqp, G,
                      interpret, precision=None):
    """Precoeff directional kernel factory (G >= 1).  Cached so repeated
    jit traces see the SAME custom-vjp function object (stable identity
    avoids recompiles, like the other factories)."""
    n_qg = nqp // G

    n_data = 3 + (1 if has_react else 0)  # xs, cdir, csrc[, cu]
    data_rows = (G * n_in, G * n_in, G) + ((G,) if has_react else ())

    def make_call(kernel, backward, out_specs, out_shape):
        def call(wts, bs, *data_and_extra):
            data = data_and_extra[:n_data]
            extra = data_and_extra[n_data:]
            kp = data[0].shape[1] // n_qg
            n_i = kp // tile
            grid = (n_i, n_qg)

            def col_map(i, qg):
                return (0, qg * n_i + i)

            in_specs = [
                pl.BlockSpec((rows, tile), col_map, memory_space=pltpu.VMEM)
                for rows in data_rows
            ]
            ops = _blocked_weight_ops(wts, bs, n_layers, G)
            if backward:  # gr cotangent + wl_col
                in_specs.append(
                    pl.BlockSpec((1, tile), lambda i, qg: (0, i),
                                 memory_space=pltpu.VMEM)
                )
                wl_col = jnp.transpose(wts[-1])  # [Hlast, 1]
                in_specs.append(
                    pl.BlockSpec(wl_col.shape, lambda i, qg: (0, 0),
                                 memory_space=pltpu.VMEM)
                )
                extra = (*extra, wl_col)
            for op in ops:
                in_specs.append(
                    pl.BlockSpec(op.shape, lambda i, qg: (0, 0),
                                 memory_space=pltpu.VMEM)
                )
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs(wts, bs, kp),
                out_shape=out_shape(wts, bs, kp),
                interpret=interpret,
            )(*data, *extra, *ops)

        return call

    fwd_kernel = functools.partial(
        _dirp_fwd_kernel, n_in, n_layers, has_react, activation, precision,
        G,
    )
    bwd_kernel = functools.partial(
        _dirp_bwd_kernel, n_in, n_layers, has_react, activation, precision,
        G,
    )

    fwd_call = make_call(
        fwd_kernel, backward=False,
        out_specs=lambda wts, bs, kp: pl.BlockSpec(
            (1, tile), lambda i, qg: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=lambda wts, bs, kp: jax.ShapeDtypeStruct((1, kp),
                                                           jnp.float32),
    )

    def bwd_out_specs(wts, bs, kp):
        return [
            pl.BlockSpec(s, lambda i, qg: (0, 0), memory_space=pltpu.VMEM)
            for s in _blocked_bwd_shapes(wts, n_in, n_layers, G)
        ]

    def bwd_out_shape(wts, bs, kp):
        return [jax.ShapeDtypeStruct(s, jnp.float32)
                for s in _blocked_bwd_shapes(wts, n_in, n_layers, G)]

    bwd_call = make_call(bwd_kernel, backward=True,
                         out_specs=bwd_out_specs, out_shape=bwd_out_shape)

    @jax.custom_vjp
    def f(wts, bs, *data):
        return fwd_call(wts, bs, *data)

    def f_fwd(wts, bs, *data):
        return f(wts, bs, *data), (wts, bs, data)

    def f_bwd(res, gr):
        wts, bs, data = res
        grads = bwd_call(wts, bs, *data, gr)
        d_wts, d_bs = _reduce_blocked_grads(grads, wts, n_layers, G)
        return (d_wts, d_bs) + tuple(jnp.zeros_like(a) for a in data)

    f.defvjp(f_fwd, f_bwd)
    return f


def pallas_fused_residual(
    params,
    quad,
    activation: str = "tanh",
    scale=None,
    shift=None,
    *,
    time_dependent: bool,
    has_react: bool = False,
    tile: Optional[int] = None,
    interpret: bool = False,
    precision=None,
    directional: bool = True,
    q_block: Optional[int] = None,
    prepared=None,
    precoeff: bool = False,
    sublane_pad: bool = False,
    fourier_bt=None,
    nl_vec=None,
    hard=None,
):
    """Weak residual r [K] via the fully-fused kernel.

    params: MLP pytree; quad: QuadData (device arrays); scale/shift: input
    scaling (or None).  Restriction: plain or Fourier-embedded MLP trial
    function, fixed source (no trainable source_fn — the general path
    handles that).  MOR/parametric inputs ARE supported: any coordinate
    columns beyond x (and t) get zero derivative coefficients (the weak
    form never differentiates in mu — SURVEY.md §3.5).

    fourier_bt: optional [F, n_in] fixed matrix 2*pi*B^T — the trial net
    is then MLP([sin|cos](x_scaled @ B * 2*pi)) (models.mlp.ff_apply).
    The embedding and its directional tangent run IN-KERNEL (_embed_dir),
    so Fourier-feature configs (e.g. the contaminant flagship) keep the
    fully-fused hot path instead of falling back to the value+jac kernel.
    Requires directional=True, no precoeff, order-1 test tables, and
    forces q_block=1 (the blocked weights assume the raw-coordinate
    layer 0; width-96 FF nets resolve to G=1 anyway).

    directional=True (default) uses the 2-panel directional-tangent kernel
    (the integrand contracts du with a fixed per-point direction, so the
    full jacobian is never needed) — ~(1+n_in)/2 x less matmul work than
    the jacobian-panel kernel it replaces; False keeps the round-1 kernel
    (comparison/benchmarking).

    q_block: process G quadrature points per program with block-diagonal
    hidden weights (see the Q-BLOCKED section above) — cuts MXU column
    passes per point by ~G for narrow nets.  None = auto (largest of
    {4, 2} fitting the MXU height) on the compiled path, 1 under
    interpret so existing CPU tests keep exercising the plain kernels.
    Requires directional=True when > 1.

    prepared: optional (xs, flds) from prepare_residual_layout — skips
    the per-step layout transform for fixed quadrature data (the trainer
    precomputes it once per shard; ~10% of the step at bench size).

    precoeff=True selects the precomputed-coefficient variant: the
    integrand coefficients are folded into the prepared data
    (prepare_residual_coeffs; `prepared` is then its (xs, cdir, csrc
    [, cu]) tuple) and the kernel does no table work.  Requires
    directional=True.  This is the only variant that supports per-node
    [K, nQ] test tables (order-2 test space).

    sublane_pad=True (precoeff only) zero-pads every hidden width to a
    multiple of 8 (the f32 sublane height) BEFORE blocking, so the
    G-blocked row concats are sublane-aligned and larger G fits the MXU
    cleanly (width 20 -> 24 admits G=5: 120/128 rows vs G=4's 80/128 at
    unaligned 20-row blocks, which is where the pathological G=6 Mosaic
    compile came from).  Numerically exact: padded rows carry zero
    weights/biases, and gradient un-padding falls out of autodiff
    through the jnp.pad.  Experimental knob, off by default.
    """
    k, nq, n_in = quad.coords.shape
    d = quad.dN.shape[-1]
    n_layers = len(params)
    from .pallas_mlp import _auto_tile

    if hard is not None and not precoeff:
        # the exact-imposition fold lives in the coefficient tables —
        # only the precoeff variant consumes those (see
        # prepare_residual_coeffs); api gating selects it for hard_bc
        raise ValueError("hard transform tables require precoeff=True")

    nl = None
    if nl_vec is not None:
        # Nonlinear advection u (b . grad u): bilinear in (u, du) — only
        # the jacobian-panel kernel produces both (DESIGN.md decision 16).
        if directional or precoeff or fourier_bt is not None:
            raise ValueError(
                "nl_vec requires the jacobian-panel kernel "
                "(directional=False, no precoeff, no fourier_bt)"
            )
        nl = tuple(float(v) for v in np.atleast_1d(np.asarray(nl_vec)))
        if len(nl) != d:
            raise ValueError(f"nl_vec has {len(nl)} entries; d={d}")

    if sublane_pad:
        if not precoeff:
            raise ValueError("sublane_pad requires precoeff=True")
        # pad BEFORE layout resolution so G/tile see the aligned widths
        params = _pad_hidden_widths(params)
    n_ff = 0
    if fourier_bt is not None:
        if not directional:
            raise ValueError("fourier_bt requires directional=True")
        if precoeff:
            raise ValueError("fourier_bt is not supported with precoeff=True")
        n_ff = int(fourier_bt.shape[0])
        if fourier_bt.shape != (n_ff, n_in):
            raise ValueError(
                f"fourier_bt shape {fourier_bt.shape} != (F, n_in={n_in})"
            )
    h_max = max(l["w"].shape[1] for l in params)
    # Auto q_block: the largest G in {4, 2} whose blocked state fits the
    # MXU height and divides nq — measured best on v5e (kernel_probe.json).
    # G=6 additionally triggers a pathological (~14 min) Mosaic compile
    # from the unaligned 20-row block concats; G in {2,4} compile in
    # seconds.  Tile: for tanh/sigmoid the retained pre-activation panels
    # are DEAD (act' is a function of the output alone) and Mosaic frees
    # them, so the directional path gets a doubled effective VMEM budget —
    # measured: G=4/h=80 compiles and runs at tile 4096 (9MB-budget cap:
    # 2048) and hits the real scoped-VMEM wall only at 6144.
    G, tile = resolve_layout(
        h_max, nq, n_layers, n_in, activation=activation,
        directional=directional, interpret=interpret, tile=tile,
        q_block=q_block, precision=precision, n_ff=n_ff,
    )
    if G > 1 and not directional:
        raise ValueError("q_block > 1 requires directional=True")

    kp = _round_up(max(k, 1), tile)
    nqp = _round_up(nq, G)

    if precoeff:
        if not directional:
            raise ValueError("precoeff requires directional=True")
        # the cu (value-coefficient) operand carries reaction AND/OR the
        # hard-BC n-coefficient — one kernel flag covers both
        has_cu = bool(has_react) or hard is not None
        n_data = 3 + (1 if has_cu else 0)
        if prepared is not None:
            data = tuple(prepared)
            exp_cols = (nqp // G) * kp
            exp = ((G * n_in, exp_cols), (G * n_in, exp_cols),
                   (G, exp_cols)) + (((G, exp_cols),) if has_cu else ())
            if len(data) != n_data or tuple(a.shape for a in data) != exp:
                raise ValueError(
                    f"prepared coeff shapes {[a.shape for a in data]} != "
                    f"expected {list(exp)} (G={G}, tile={tile}) — prepare "
                    "with prepare_residual_coeffs and the same "
                    "resolve_layout parameters"
                )
        else:
            data = prepare_residual_coeffs(
                quad, scale, shift, time_dependent=time_dependent,
                has_react=has_react, G=G, tile=tile, hard=hard,
            )
        wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32)
                    for l in params)
        bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32)
                   for l in params)
        f = _dirp_residual_fn(
            n_in, n_layers, has_cu, activation, tile, nqp, G,
            bool(interpret), precision,
        )
        r = f(wts, bs, *data)
        return r[0, :k]

    if quad.N.ndim != 1:
        raise ValueError(
            "per-node test tables (test_order=2) require precoeff=True"
        )

    if prepared is not None:
        xs, flds = prepared
        exp_cols = (nqp // G) * kp
        exp_nf = 2 + d + (1 if has_react else 0)  # kappa, vel, src[, react]
        if xs.shape != (G * n_in, exp_cols) or flds.shape != (
            G * exp_nf, exp_cols,
        ):
            raise ValueError(
                f"prepared layout shapes xs={xs.shape} flds={flds.shape} != "
                f"expected xs={(G * n_in, exp_cols)} "
                f"flds={(G * exp_nf, exp_cols)} (G={G}, tile={tile}, "
                f"has_react={has_react}) — prepare with the same "
                "resolve_layout parameters"
            )
    else:
        xs, flds = prepare_residual_layout(
            quad, scale, shift, has_react=has_react, G=G, tile=tile
        )

    tab = jnp.concatenate(
        [
            jnp.reshape(quad.N, (nq, 1)),
            jnp.reshape(quad.w, (nq, 1)),
            jnp.reshape(quad.dN, (nq, d)),
        ],
        axis=1,
    ).astype(jnp.float32)
    if nqp != nq:
        # zero rows: w_q = 0 zeroes every padded-q coefficient in-kernel
        tab = jnp.pad(tab, ((0, nqp - nq), (0, 0)))
    if scale is None:
        scale_col = jnp.ones((n_in, 1), jnp.float32)
    else:
        scale_col = jnp.reshape(scale, (n_in, 1)).astype(jnp.float32)

    wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32) for l in params)
    bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32) for l in params)

    if G > 1:
        f = _dirq_residual_fn(
            n_in, n_layers, d, bool(time_dependent), bool(has_react),
            activation, tile, nqp, G, bool(interpret), precision,
        )
    else:
        f = _fused_residual_fn(
            n_in, n_layers, d, bool(time_dependent), bool(has_react),
            activation, tile, nqp, bool(interpret), precision,
            directional=bool(directional), n_ff=n_ff, nl=nl,
        )
    if n_ff:
        bt = jnp.asarray(fourier_bt, jnp.float32)
        r = f(wts, bs, xs, flds, tab, scale_col, bt)  # [1, kp]
    else:
        r = f(wts, bs, xs, flds, tab, scale_col)  # [1, kp]
    return r[0, :k]
