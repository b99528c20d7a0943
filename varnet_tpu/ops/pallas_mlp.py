"""Fused Pallas TPU kernel: MLP forward + input-jacobian (+ custom VJP).

The hot op of the whole framework (SURVEY.md §7 step 6 and "hard parts"
item 1; BASELINE.json north star: "values and spatial gradients evaluated
in one fused Pallas forward+jacobian kernel at all quadrature points").
Replaces the stock matmul-chain path ``models.mlp.mlp_value_and_jac``
behind the SAME signature.

Why a kernel: the XLA path materializes per-layer activation+jacobian
state ([P, 1+n_in, H], ~GBs at bench sizes) in HBM between layers, and the
backward pass reads it all again — the step is HBM-bound at ~1% MXU
utilization.  Here a block of points is loaded to VMEM ONCE; all layers,
the jacobian propagation, and (in the backward kernel) the full parameter-
gradient accumulation run out of VMEM; HBM traffic drops to the inputs,
outputs, and one [H, H]-sized gradient per layer.

Layout: everything transposed — x is carried as [n_in, P] so the point
axis lands on the TPU lane dimension (128-wide) and hidden size H on the
sublane axis.  The jacobian is n_in separate [H, T] panels (n_in <= ~4,
static unroll).  The backward kernel recomputes the forward in VMEM
(cheap) and accumulates dW/db across the sequential TPU grid into
constant-index output blocks.

Forward-mode recurrence (per point block, T = tile size):
    a_1   = act(Wt_1 @ xs + b_1)             xs: scaled inputs [n_in, T]
    J_1^j = act'(a_1) * Wt_1[:, j]           (column broadcast)
    a_l   = act(Wt_l @ a_{l-1} + b_l)
    P_l^j = Wt_l @ J_{l-1}^j ;  J_l^j = act'(a_l) * P_l^j
    u     = Wt_L @ a_{L-1} + b_L ;  du^j = Wt_L @ J_{L-1}^j
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 4096  # measured best on v5e (benchmarks/kernel_bench.py)
# Of the 16MB scoped-VMEM limit.  9MB (not 10) because the surrounding
# program context (remat-under-while in the LM CG loop) adds stack
# allocations on top of the model below — measured 33KB over the limit at
# 10MB budget, width 48 x 3 hidden (round-2 LM bench).
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def _auto_tile(requested: int, h_max: int, n_layers: int, n_in: int,
               budget_bytes: int | None = None) -> int:
    """Cap the point tile so the packed backward's per-program VMEM state
    (s_packed per layer + z/a + gradient panels + temporaries) fits the
    scoped budget.  Measured blow-up otherwise: width 48 x 3 hidden at
    tile 4096 needs ~32MB > 16MB.

    ``budget_bytes`` overrides the default budget — the fused-residual
    dispatcher (pallas_residual.resolve_layout) shrinks it 0.75x under
    HIGHEST precision (multi-pass f32 matmul scratch) and doubles it for
    tanh/sigmoid directional kernels inside the measured G*h <= 80
    envelope (pre-activation panels never read back)."""
    if budget_bytes is None:
        budget_bytes = _VMEM_BUDGET_BYTES
    denom = 4 * max(h_max, 1) * ((1 + n_in) * (n_layers + 1) + 2 * n_layers)
    cap = max(256, (budget_bytes // denom) // 256 * 256)
    return int(min(requested, cap))


def _vjp_budget(h_max: int, n_in: int) -> int | None:
    """Value+jac-kernel budget override for WIDE x HIGH-DIM shapes.

    Measured (2026-08-20, /tmp/tpu_queue15 hardbc_3dt): the custom-VJP
    backward at h=64 / n_in=4 / 3 layers ran the default 9 MB static
    estimate at 16.02 MB actual scoped VMEM (1.78x overhead) — 17 KB
    over the 16 MB limit, under the plain Adam step (3-Dt hard BC
    declines the fused-residual kernel, so value+jac carries training).
    h=64 / n_in=3 fits (hardbc 3-D steady ran clean the same night), so
    the clamp gates on BOTH h >= 56 and n_in >= 4: a 7 MB budget sizes
    the same shape to tile 1024 (~12.8 MB actual).  Narrow TPU-proven
    recipes keep their measured tiles.  None = use the default budget."""
    if h_max >= 56 and n_in >= 4:
        return 7 * 1024 * 1024
    return None


def _auto_tile_jvp(requested: int, h_max: int, n_in: int) -> int:
    """Tile cap for the parameter-tangent JVP kernels (_jvp_kernel /
    _jvp_kernel_ff), whose per-program live set is LARGER than the
    forward/backward kernels': 5 packed panels [h, (1+n)T] (s, ds, zc,
    dzc, s_new) + 2 tiled slope panels [h, nT] + 7 elementwise temps
    [h, T] = (7*n_in + 12) units of h*T*4 bytes, before Mosaic's concat
    copies, pipeline double-buffering, and HIGHEST-precision multi-pass
    scratch.

    Calibration: Mosaic reports 23.76 MB scoped at (h=64, n_in=3,
    n_layers=3, tile=1536, HIGHEST) = 60.4 units vs the 33-unit live set
    -> overhead factor 1.83; 2.0 used below for headroom.  The h=48
    flagship shape sat within ~5% of the 16 MB limit under the OLD
    (_auto_tile) cap — this formula backs it off to ~9 MB usage so remat
    stack under the CG while-loop keeps its margin (see
    benchmarks/results/ad3d_floor.json round-3 TPU failure)."""
    units = 2.0 * (7 * n_in + 12)
    budget = 12 * 1024 * 1024  # 16 MB scoped limit minus remat headroom
    cap = max(256, int(budget / (4.0 * max(h_max, 1) * units)) // 256 * 256)
    return int(min(requested, cap))


def _auto_tile_lm(requested: int, h_max: int, n_layers: int,
                  n_in: int) -> int:
    """Tile cap for the value+jac kernel pair when it runs under the LM
    CG loop (``VarNet.refine_lm``): there the custom-VJP backward
    executes inside transpose(jvp)/while/checkpoint, and the remat stack
    plus pipeline double-buffering sit ON TOP of the kernel's scoped
    VMEM.  The overhead over ``_auto_tile``'s static live-set estimate
    GROWS WITH WIDTH — measured LM runs at ~9 MB static estimates:
    h=20/tile 5120 and h=48/tile 1536 fit the 16 MB limit, while
    h=64/n_in=3/n_layers=4/tile 1280 hit 19.33 MB (~2.1x; 3-D disc-16 LM
    push, 2026-08-18 /tmp/tpu_queue3).  So the cap only binds for wide
    nets (h >= 56), where it sizes tiles for a 12 MB budget at a 2.5x
    factor; the TPU-proven narrow recipes keep their measured tiles."""
    if h_max < 56:
        return int(requested)
    denom = 4 * max(h_max, 1) * ((1 + n_in) * (n_layers + 1) + 2 * n_layers)
    cap = max(256, int(12 * 1024 * 1024 / (2.5 * denom)) // 256 * 256)
    return int(min(requested, cap))


def _act_pair(name: str):
    """(act, act_p(z, a), act_pp(z, a, sp)): first/second derivative
    helpers taking BOTH pre-activation z and output a (tanh/sigmoid use a,
    sin uses z — SIREN-style nets)."""
    if name == "tanh":
        return (
            jnp.tanh,
            (lambda z, a: 1.0 - a * a),
            (lambda z, a, sp: -2.0 * a * sp),
        )

    if name == "sigmoid":
        return (
            jax.nn.sigmoid,
            (lambda z, a: a * (1.0 - a)),
            (lambda z, a, sp: (1.0 - 2.0 * a) * sp),
        )
    if name == "sin":
        return (
            jnp.sin,
            (lambda z, a: jnp.cos(z)),
            (lambda z, a, sp: -a),
        )
    raise ValueError(f"unknown activation '{name}'")


def _small_k_mm(w, xs, n_in):
    """w [H, n_in] @ xs [n_in, T] as a broadcast-sum: Mosaic rejects tiny-K
    dots under HIGHEST precision ("only constant accumulators supported"),
    and for K <= 4 the VPU form also avoids MXU pad waste entirely."""
    acc = w[:, 0:1] * xs[0:1, :]
    for j in range(1, n_in):
        acc = acc + w[:, j : j + 1] * xs[j : j + 1, :]
    return acc


def _outer(col, row):
    """col [H,1] (x) row [1,T] -> [H,T] — outer product as a broadcast
    multiply (Mosaic rejects K=1 dots)."""
    return col * row


def _small_n_mm_t(a, xs, n_in):
    """a [H,T] @ xs.T [T,n_in] -> [H,n_in] via per-column broadcast-sums
    (Mosaic rejects tiny-N reduction dots)."""
    cols = [
        jnp.sum(a * xs[j : j + 1, :], axis=1, keepdims=True)
        for j in range(n_in)
    ]
    return jnp.concatenate(cols, axis=1)


def _make_mm(precision):
    def _mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=precision)

    return _mm


# ---------------------------------------------------------------------- #
# Fourier-feature embedding (in-kernel; SEEDS the jacobian panels)


def _embed(xs, bt2pi):
    """xs [n_in, T], bt2pi = 2*pi*B^T [F, n_in] ->
    a0 [2F, T], J0 list of n_in panels [2F, T]."""
    n_in = xs.shape[0]
    ang = _small_k_mm(bt2pi, xs, n_in)  # [F, T]
    s, c = jnp.sin(ang), jnp.cos(ang)
    a0 = jnp.concatenate([s, c], axis=0)
    j0 = [
        jnp.concatenate(
            [c * bt2pi[:, j : j + 1], -s * bt2pi[:, j : j + 1]], axis=0
        )
        for j in range(n_in)
    ]
    return a0, j0


# ---------------------------------------------------------------------- #
# forward kernel


def _fwd_kernel(n_in: int, n_layers: int, activation: str, precision, *refs):
    """refs: xs, Wt_1, b_1, ..., Wt_L, b_L, out.

    xs  [n_in, T]; Wt_l [H_l, H_{l-1}]; b_l [H_l, 1]
    out [1 + n_in, T]: row 0 = u, rows 1.. = du/dxs (scaled coords).
    """
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref = refs[0]
    w_refs = refs[1 : 1 + 2 * n_layers]
    out_ref = refs[1 + 2 * n_layers]
    t = xs_ref.shape[1]

    # PANEL-PACKED layout: the activation panel and the n_in jacobian
    # panels are concatenated along the LANE axis into one [H, (1+n)T]
    # array, so every layer is ONE wide matmul (MXU util ~(1+n)x better
    # than per-panel dots at these tiny hidden sizes).
    xs = xs_ref[:]
    z = _small_k_mm(w_refs[0][:], xs, n_in) + w_refs[1][:]
    a = act(z)
    sp = act_p(z, a)
    s_panels = jnp.concatenate(
        [a] + [sp * w_refs[0][:, j : j + 1] for j in range(n_in)], axis=1
    )  # [H, (1+n) T]
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        zc = _mm(wt, s_panels)  # [H, (1+n) T]
        z = zc[:, :t] + b
        a = act(z)
        sp = act_p(z, a)
        sp_tiled = jnp.concatenate([sp] * n_in, axis=1)
        s_panels = jnp.concatenate([a, sp_tiled * zc[:, t:]], axis=1)
    wt, b = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    oc = _mm(wt, s_panels)  # [1, (1+n) T]
    out_ref[0:1, :] = oc[:, :t] + b
    for j in range(n_in):
        out_ref[j + 1 : j + 2, :] = oc[:, (j + 1) * t : (j + 2) * t]


def _fwd_pallas(wts, bs, xs_t, *, n_in, tile, activation, precision, interpret):
    """xs_t [n_in, P] (P % tile == 0) -> out [1 + n_in, P]."""
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    grid = (p_total // tile,)

    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    wb = [x for pair in zip(wts, bs) for x in pair]
    in_specs += _wb_specs(wts, bs)
    out_spec = pl.BlockSpec(
        (1 + n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_fwd_kernel, n_in, n_layers, activation, precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1 + n_in, p_total), jnp.float32),
        interpret=interpret,
    )(xs_t, *wb)


def _fwd_kernel_ff(n_in: int, n_layers: int, activation: str, precision, *refs):
    """Fourier variant: refs = xs, bt2pi, Wt/b pairs, out.
    The embedding runs in-kernel and seeds the jacobian panels."""
    _mm = _make_mm(precision)
    act, act_p, _ = _act_pair(activation)
    xs_ref, bt_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + 2 * n_layers]
    out_ref = refs[2 + 2 * n_layers]

    a0, j0 = _embed(xs_ref[:], bt_ref[:])
    z = _mm(w_refs[0][:], a0) + w_refs[1][:]
    a = act(z)
    sp = act_p(z, a)
    jac = [sp * _mm(w_refs[0][:], j0[j]) for j in range(n_in)]
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        z = _mm(wt, a) + b
        a = act(z)
        sp = act_p(z, a)
        jac = [sp * _mm(wt, jac[j]) for j in range(n_in)]
    wt, b = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    out_ref[0:1, :] = _mm(wt, a) + b
    for j in range(n_in):
        out_ref[j + 1 : j + 2, :] = _mm(wt, jac[j])


def _bwd_kernel_ff(n_in: int, n_layers: int, activation: str, precision, *refs):
    """Fourier variant backward: refs = xs, g, bt2pi, Wt/b pairs, then
    outputs dWt_1, db_1, ..., dWt_L, db_L."""
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, g_ref, bt_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + 2 * n_layers]
    out_refs = refs[3 + 2 * n_layers :]
    i = pl.program_id(0)

    # forward recompute (all state in VMEM)
    a0, j0 = _embed(xs_ref[:], bt_ref[:])
    acts, zs, pres, jacs = [], [], [], []
    z = _mm(w_refs[0][:], a0) + w_refs[1][:]
    a = act(z)
    sp = act_p(z, a)
    pre = [_mm(w_refs[0][:], j0[j]) for j in range(n_in)]
    jac = [sp * pre[j] for j in range(n_in)]
    acts.append(a)
    zs.append(z)
    pres.append(pre)
    jacs.append(list(jac))
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        z = _mm(wt, a) + b
        a_new = act(z)
        sp = act_p(z, a_new)
        pre = [_mm(wt, jac[j]) for j in range(n_in)]
        jac = [sp * pre[j] for j in range(n_in)]
        a = a_new
        acts.append(a)
        zs.append(z)
        pres.append(pre)
        jacs.append(list(jac))

    gu = g_ref[0:1, :]
    gdu = [g_ref[j + 1 : j + 2, :] for j in range(n_in)]

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i != 0)
        def _():
            ref[:] = ref[:] + val

    wt_last = w_refs[2 * (n_layers - 1)][:]
    d_wt = _mm(gu, acts[-1].T)
    for j in range(n_in):
        d_wt = d_wt + _mm(gdu[j], jacs[-1][j].T)
    accum(out_refs[2 * (n_layers - 1)], d_wt)
    accum(out_refs[2 * (n_layers - 1) + 1], jnp.sum(gu, axis=1, keepdims=True))
    ga = _mm(wt_last.T, gu)
    g_jac = [_mm(wt_last.T, gdu[j]) for j in range(n_in)]

    for l in range(n_layers - 2, -1, -1):
        a_l = acts[l]
        sp = act_p(zs[l], a_l)
        spp = act_pp(zs[l], a_l, sp)
        gz = sp * ga
        for j in range(n_in):
            gz = gz + (g_jac[j] * pres[l][j]) * spp
        gp = [sp * g_jac[j] for j in range(n_in)]
        a_in = a0 if l == 0 else acts[l - 1]
        j_in = j0 if l == 0 else jacs[l - 1]
        d_wt = _mm(gz, a_in.T)
        for j in range(n_in):
            d_wt = d_wt + _mm(gp[j], j_in[j].T)
        wt_l = w_refs[2 * l][:]
        accum(out_refs[2 * l], d_wt)
        accum(out_refs[2 * l + 1], jnp.sum(gz, axis=1, keepdims=True))
        if l > 0:
            ga = _mm(wt_l.T, gz)
            g_jac = [_mm(wt_l.T, gp[j]) for j in range(n_in)]


# ---------------------------------------------------------------------- #
# JVP (parameter-tangent) kernel — forward-mode through the packed forward
#
# Needed by Levenberg-Marquardt: GN curvature is one jvp + one vjp per CG
# iteration (train/gauss_newton.py), and the custom-VJP'd fused op has no
# forward rule.  This kernel propagates the parameter tangents (dW, db)
# alongside the panel-packed primal state, producing d(out) for fixed xs:
#
#     dz_1 = dWt_1 @ xs + db_1 ;  da = act'(z) dz ;  dsp = act''(z) dz
#     dJ_1^j = dsp * Wt_1[:, j] + sp * dWt_1[:, j]
#     dzc_l = dWt_l @ s + Wt_l @ ds ;  ds = [da | dsp~*zc_j + sp~*dzc_j]
#     dout  = dWt_L @ s + Wt_L @ ds (+ db_L on the value row)
#
# Only the CURRENT layer's (s, ds) pair lives in VMEM (no stored panels),
# so the state is ~2x the forward kernel's — comfortably under the budget
# at the same tile sizes.


def _jvp_kernel(n_in: int, n_layers: int, activation: str, precision, *refs):
    """refs: xs, Wt/b pairs, dWt/db pairs, out dout [1 + n_in, T]."""
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref = refs[0]
    w_refs = refs[1 : 1 + 2 * n_layers]
    dw_refs = refs[1 + 2 * n_layers : 1 + 4 * n_layers]
    out_ref = refs[1 + 4 * n_layers]
    t = xs_ref.shape[1]

    xs = xs_ref[:]
    w1, b1 = w_refs[0][:], w_refs[1][:]
    dw1, db1 = dw_refs[0][:], dw_refs[1][:]
    z = _small_k_mm(w1, xs, n_in) + b1
    dz = _small_k_mm(dw1, xs, n_in) + db1
    a = act(z)
    sp = act_p(z, a)
    spp = act_pp(z, a, sp)
    da = sp * dz
    dsp = spp * dz
    s = jnp.concatenate(
        [a] + [sp * w1[:, j : j + 1] for j in range(n_in)], axis=1
    )
    ds = jnp.concatenate(
        [da]
        + [dsp * w1[:, j : j + 1] + sp * dw1[:, j : j + 1] for j in range(n_in)],
        axis=1,
    )
    _jvp_tail(_mm, act, act_p, act_pp, n_in, n_layers, w_refs, dw_refs,
              s, ds, t, out_ref)


def _jvp_tail(_mm, act, act_p, act_pp, n_in, n_layers, w_refs, dw_refs,
              s, ds, t, out_ref):
    """Hidden + output layers of the parameter-tangent JVP propagation,
    shared by the plain (_jvp_kernel) and Fourier (_jvp_kernel_ff) variants
    (they differ only in how the layer-0 packed state (s, ds) is seeded)."""
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        dwt, db = dw_refs[2 * l][:], dw_refs[2 * l + 1][:]
        zc = _mm(wt, s)
        dzc = _mm(dwt, s) + _mm(wt, ds)
        z = zc[:, :t] + b
        dz = dzc[:, :t] + db
        a = act(z)
        sp = act_p(z, a)
        spp = act_pp(z, a, sp)
        da = sp * dz
        dsp = spp * dz
        sp_tiled = jnp.concatenate([sp] * n_in, axis=1)
        dsp_tiled = jnp.concatenate([dsp] * n_in, axis=1)
        s_new = jnp.concatenate([a, sp_tiled * zc[:, t:]], axis=1)
        ds = jnp.concatenate(
            [da, dsp_tiled * zc[:, t:] + sp_tiled * dzc[:, t:]], axis=1
        )
        s = s_new
    wt, b = w_refs[2 * (n_layers - 1)][:], w_refs[2 * (n_layers - 1) + 1][:]
    dwt, db = dw_refs[2 * (n_layers - 1)][:], dw_refs[2 * (n_layers - 1) + 1][:]
    doc = _mm(dwt, s) + _mm(wt, ds)  # [1, (1+n) T]
    out_ref[0:1, :] = doc[:, :t] + db
    for j in range(n_in):
        out_ref[j + 1 : j + 2, :] = doc[:, (j + 1) * t : (j + 2) * t]


def _jvp_kernel_ff(n_in: int, n_layers: int, activation: str, precision,
                   *refs):
    """Fourier variant of _jvp_kernel: refs = xs, bt2pi, Wt/b pairs,
    dWt/db pairs, out.  B is fixed (no tangent); the embedding (a0, j0)
    seeds both the packed state and its parameter tangent:
        z  = W1 a0 + b1,           dz  = dW1 a0 + db1
        J_j = sp * (W1 j0_j),      dJ_j = dsp * (W1 j0_j) + sp * (dW1 j0_j)
    """
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref, bt_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + 2 * n_layers]
    dw_refs = refs[2 + 2 * n_layers : 2 + 4 * n_layers]
    out_ref = refs[2 + 4 * n_layers]
    t = xs_ref.shape[1]

    a0, j0 = _embed(xs_ref[:], bt_ref[:])
    w1, b1 = w_refs[0][:], w_refs[1][:]
    dw1, db1 = dw_refs[0][:], dw_refs[1][:]
    z = _mm(w1, a0) + b1
    dz = _mm(dw1, a0) + db1
    a = act(z)
    sp = act_p(z, a)
    spp = act_pp(z, a, sp)
    da = sp * dz
    dsp = spp * dz
    pre = [_mm(w1, j0[j]) for j in range(n_in)]
    dpre = [_mm(dw1, j0[j]) for j in range(n_in)]
    s = jnp.concatenate([a] + [sp * pre[j] for j in range(n_in)], axis=1)
    ds = jnp.concatenate(
        [da] + [dsp * pre[j] + sp * dpre[j] for j in range(n_in)], axis=1
    )
    _jvp_tail(_mm, act, act_p, act_pp, n_in, n_layers, w_refs, dw_refs,
              s, ds, t, out_ref)


def _jvp_pallas(wts, bs, dwts, dbs, xs_t, *, n_in, tile, activation, precision,
                interpret):
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    wb = [x for pair in list(zip(wts, bs)) + list(zip(dwts, dbs))
          for x in pair]
    in_specs += _wb_specs(wts, bs) + _wb_specs(dwts, dbs)
    kernel = functools.partial(_jvp_kernel, n_in, n_layers, activation, precision)
    return pl.pallas_call(
        kernel,
        grid=(p_total // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1 + n_in, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1 + n_in, p_total), jnp.float32),
        interpret=interpret,
    )(xs_t, *wb)


def _jvp_pallas_ff(wts, bs, dwts, dbs, xs_t, bt, *, n_in, tile, activation,
                   precision, interpret):
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(bt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    wb = [x for pair in list(zip(wts, bs)) + list(zip(dwts, dbs))
          for x in pair]
    in_specs += _wb_specs(wts, bs) + _wb_specs(dwts, dbs)
    kernel = functools.partial(_jvp_kernel_ff, n_in, n_layers, activation,
                               precision)
    return pl.pallas_call(
        kernel,
        grid=(p_total // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1 + n_in, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1 + n_in, p_total), jnp.float32),
        interpret=interpret,
    )(xs_t, bt, *wb)


@functools.lru_cache(maxsize=16)
def _fused_fn_jvp(n_in: int, n_layers: int, activation: str, tile: int,
                  interpret: bool, precision=None):
    """custom_jvp'd fused evaluation (forward-mode companion of _fused_fn).

    PARAMETER tangents only: xs_t is fixed data in every caller (quadrature
    coordinates), so its tangent is ignored.  Use _fused_fn for reverse mode.
    """

    @jax.custom_jvp
    def f(wts, bs, xs_t):
        return _fwd_pallas(
            wts, bs, xs_t, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        wts, bs, xs_t = primals
        dwts, dbs, _ = tangents  # d(xs_t) ignored: fixed quadrature coords
        out = f(wts, bs, xs_t)
        dout = _jvp_pallas(
            wts, bs, tuple(dwts), tuple(dbs), xs_t, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )
        return out, dout

    return f


@functools.lru_cache(maxsize=16)
def _fused_fn_jvp_ff(n_in: int, n_layers: int, activation: str, tile: int,
                     interpret: bool, precision=None):
    """custom_jvp'd Fourier-embedded evaluation (forward-mode companion of
    _fused_fn_ff).  PARAMETER tangents only: xs_t and bt are fixed data."""

    @jax.custom_jvp
    def f(wts, bs, xs_t, bt):
        return _fwd_pallas_ff(
            wts, bs, xs_t, bt, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        wts, bs, xs_t, bt = primals
        dwts, dbs, _, _ = tangents  # d(xs_t)/d(bt) ignored: fixed data
        out = f(wts, bs, xs_t, bt)
        dout = _jvp_pallas_ff(
            wts, bs, tuple(dwts), tuple(dbs), xs_t, bt, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )
        return out, dout

    return f


def pallas_ff_value_and_jac_jvp(
    b_mat,
    params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward-mode-differentiable variant of :func:`pallas_ff_value_and_jac`
    (the Fourier twin of :func:`pallas_value_and_jac_jvp`): supports
    ``jax.jvp`` w.r.t. PARAMS with B and the input points treated as
    constants — the Levenberg-Marquardt J v side for Fourier-embedded trial
    nets.  NOT reverse-mode differentiable; pair with
    ``pallas_ff_value_and_jac`` (see ``VarNet.refine_lm``)."""
    p, n_in = x.shape
    n_layers = len(params)
    if n_layers < 2:
        from ..models.mlp import ff_value_and_jac

        return ff_value_and_jac(b_mat, params, x, activation, scale, shift)
    h_max = max(l["w"].shape[1] for l in params)
    tile = _auto_tile_jvp(tile, max(2 * b_mat.shape[1], h_max), n_in)
    f = _fused_fn_jvp_ff(n_in, n_layers, activation, tile, bool(interpret),
                         precision)

    xs = x if scale is None else (x - shift) * scale
    xs_t = jnp.transpose(xs).astype(jnp.float32)
    p_pad = _round_up(max(p, 1), tile)
    if p_pad != p:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, p_pad - p)))
    bt = (2.0 * jnp.pi) * jnp.transpose(b_mat).astype(jnp.float32)
    wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32) for l in params)
    bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32) for l in params)
    out = f(wts, bs, xs_t, bt)
    u = out[0, :p]
    du_scaled = out[1:, :p]
    if scale is not None:
        du_scaled = du_scaled * scale[:, None].astype(du_scaled.dtype)
    return u, jnp.transpose(du_scaled)


def pallas_value_and_jac_jvp(
    params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward-mode-differentiable variant of :func:`pallas_value_and_jac`.

    Same signature/semantics; supports ``jax.jvp`` w.r.t. PARAMS (the input
    points are treated as constants — exactly the Levenberg-Marquardt use,
    where quadrature coordinates are fixed data).  NOT reverse-mode
    differentiable: pair it with :func:`pallas_value_and_jac` when both
    directions are needed (see ``VarNet.refine_lm``).
    """
    p, n_in = x.shape
    n_layers = len(params)
    if n_layers < 2:
        from ..models.mlp import mlp_value_and_jac

        return mlp_value_and_jac(params, x, activation, scale, shift)
    h_max = max(l["w"].shape[1] for l in params)
    tile = _auto_tile_jvp(tile, h_max, n_in)
    f = _fused_fn_jvp(n_in, n_layers, activation, tile, bool(interpret),
                      precision)

    xs = x if scale is None else (x - shift) * scale
    xs_t = jnp.transpose(xs).astype(jnp.float32)
    p_pad = _round_up(max(p, 1), tile)
    if p_pad != p:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, p_pad - p)))
    wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32) for l in params)
    bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32) for l in params)
    out = f(wts, bs, xs_t)
    u = out[0, :p]
    du_scaled = out[1:, :p]
    if scale is not None:
        du_scaled = du_scaled * scale[:, None].astype(du_scaled.dtype)
    return u, jnp.transpose(du_scaled)


# ---------------------------------------------------------------------- #
# backward kernel (parameter gradients only — quadrature coords are fixed)


def _bwd_kernel(n_in: int, n_layers: int, activation: str, precision, *refs):
    """refs: xs, g (cotangents [1+n_in, T]), Wt/b pairs, then outputs:
    dWt_1, db_1, ..., dWt_L, db_L (accumulated across the grid).
    """
    _mm = _make_mm(precision)
    act, act_p, act_pp = _act_pair(activation)
    xs_ref = refs[0]
    g_ref = refs[1]
    w_refs = refs[2 : 2 + 2 * n_layers]
    out_refs = refs[2 + 2 * n_layers :]
    t = xs_ref.shape[1]

    i = pl.program_id(0)

    # ---- forward recompute, PANEL-PACKED (see _fwd_kernel) -------------
    xs = xs_ref[:]
    acts, zs, pres_c, s_packed = [], [], [], []
    z = _small_k_mm(w_refs[0][:], xs, n_in) + w_refs[1][:]
    a = act(z)
    sp = act_p(z, a)
    s = jnp.concatenate(
        [a] + [sp * w_refs[0][:, j : j + 1] for j in range(n_in)], axis=1
    )
    acts.append(a)
    zs.append(z)
    pres_c.append(None)  # layer-1 pre panels are Wt1 column broadcasts
    s_packed.append(s)
    for l in range(1, n_layers - 1):
        wt, b = w_refs[2 * l][:], w_refs[2 * l + 1][:]
        zc = _mm(wt, s)
        z = zc[:, :t] + b
        a = act(z)
        sp = act_p(z, a)
        sp_tiled = jnp.concatenate([sp] * n_in, axis=1)
        s = jnp.concatenate([a, sp_tiled * zc[:, t:]], axis=1)
        acts.append(a)
        zs.append(z)
        pres_c.append(zc[:, t:])
        s_packed.append(s)

    # ---- backward --------------------------------------------------------
    # Rows of the [1+n, T] cotangent block sit at different sublane
    # offsets; Mosaic cannot lane-concatenate them directly, so the final
    # layer uses per-row matmuls whose [H, T] results ARE aligned.
    g_rows = [g_ref[j : j + 1, :] for j in range(1 + n_in)]

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i != 0)
        def _():
            ref[:] = ref[:] + val

    _packed_bwd_tail(
        n_in, n_layers, t, _mm, act_p, act_pp, w_refs, out_refs, accum,
        xs, zs, acts, s_packed, g_rows,
        # stored pre panels from the forward recompute
        pre_panel=lambda l, j: pres_c[l][:, j * t : (j + 1) * t],
    )


def _packed_bwd_tail(n_in, n_layers, t, _mm, act_p, act_pp, w_refs, out_refs,
                     accum, xs, zs, acts, s_packed, g_rows, pre_panel):
    """Last-layer + hidden-layer backward for the PANEL-PACKED recurrence,
    shared between the value+jac backward (here) and the fused-residual
    backward (pallas_residual._fused_bwd_kernel) — the two differed only
    in where the hidden-layer pre panels P_l^j come from, supplied by
    ``pre_panel(l, j)`` (l >= 1; layer 0 uses the Wt_1 column broadcast).
    A gradient-propagation fix lands in ONE place (round-3 review)."""
    wt_last = w_refs[2 * (n_layers - 1)][:]
    d_wt_last = None
    for j in range(1 + n_in):
        term = _mm(g_rows[j], s_packed[-1][:, j * t : (j + 1) * t].T)
        d_wt_last = term if d_wt_last is None else d_wt_last + term
    accum(out_refs[2 * (n_layers - 1)], d_wt_last)
    accum(
        out_refs[2 * (n_layers - 1) + 1],
        jnp.sum(g_rows[0], axis=1, keepdims=True),
    )
    g_s = jnp.concatenate(
        [_outer(wt_last.T, g_rows[j]) for j in range(1 + n_in)], axis=1
    )  # [H, (1+n) T] — wt_last.T is [H, 1]: outer, not dot

    # hidden layers, deepest first
    for l in range(n_layers - 2, -1, -1):
        sp = act_p(zs[l], acts[l])
        spp = act_pp(zs[l], acts[l], sp)
        ga = g_s[:, :t]
        g_jac = g_s[:, t:]  # [H, n T]
        # gz = sp*ga + spp * sum_j gJ_j * P_l^j
        acc = None
        for j in range(n_in):
            p_lj = w_refs[0][:, j : j + 1] if l == 0 else pre_panel(l, j)
            term = g_jac[:, j * t : (j + 1) * t] * p_lj
            acc = term if acc is None else acc + term
        gz = sp * ga + spp * acc
        sp_tiled = jnp.concatenate([sp] * n_in, axis=1)
        g_p = sp_tiled * g_jac  # [H, n T]

        wt_l = w_refs[2 * l][:]
        if l == 0:
            d_wt = _small_n_mm_t(gz, xs, n_in)
            cols = [
                jnp.sum(g_p[:, j * t : (j + 1) * t], axis=1, keepdims=True)
                for j in range(n_in)
            ]
            d_wt = d_wt + jnp.concatenate(cols, axis=1)
            accum(out_refs[0], d_wt)
            accum(out_refs[1], jnp.sum(gz, axis=1, keepdims=True))
        else:
            g_zc = jnp.concatenate([gz, g_p], axis=1)  # [H, (1+n) T]
            accum(out_refs[2 * l], _mm(g_zc, s_packed[l - 1].T))
            accum(out_refs[2 * l + 1], jnp.sum(gz, axis=1, keepdims=True))
            g_s = _mm(wt_l.T, g_zc)


def _bwd_pallas(wts, bs, xs_t, g, *, n_in, tile, activation, precision, interpret):
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    grid = (p_total // tile,)

    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1 + n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    wb = [x for pair in zip(wts, bs) for x in pair]
    in_specs += _wb_specs(wts, bs)
    out_specs, out_shapes = _wb_grad_outs(wts, bs)
    kernel = functools.partial(_bwd_kernel, n_in, n_layers, activation, precision)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xs_t, g, *wb)


def _wb_specs(wts, bs):
    specs = []
    for wt, b in zip(wts, bs):
        specs += [
            pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return specs


def _wb_grad_outs(wts, bs):
    """(out_specs, out_shapes) for per-layer (dW, db) gradient outputs —
    constant-index blocks accumulated across the sequential grid."""
    out_specs, out_shapes = [], []
    for wt, b in zip(wts, bs):
        out_specs += [
            pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.shape, jnp.float32),
        ]
    return out_specs, out_shapes


def _fwd_pallas_ff(wts, bs, xs_t, bt, *, n_in, tile, activation, precision,
                   interpret):
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(bt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + _wb_specs(wts, bs)
    wb = [x for pair in zip(wts, bs) for x in pair]
    kernel = functools.partial(_fwd_kernel_ff, n_in, n_layers, activation,
                               precision)
    return pl.pallas_call(
        kernel,
        grid=(p_total // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1 + n_in, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1 + n_in, p_total), jnp.float32),
        interpret=interpret,
    )(xs_t, bt, *wb)


def _bwd_pallas_ff(wts, bs, xs_t, g, bt, *, n_in, tile, activation, precision,
                   interpret):
    n_layers = len(wts)
    p_total = xs_t.shape[1]
    in_specs = [
        pl.BlockSpec((n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1 + n_in, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(bt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + _wb_specs(wts, bs)
    wb = [x for pair in zip(wts, bs) for x in pair]
    out_specs, out_shapes = _wb_grad_outs(wts, bs)
    kernel = functools.partial(_bwd_kernel_ff, n_in, n_layers, activation,
                               precision)
    return pl.pallas_call(
        kernel,
        grid=(p_total // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xs_t, g, bt, *wb)


@functools.lru_cache(maxsize=16)
def _fused_fn_ff(n_in: int, n_layers: int, activation: str, tile: int,
                 interpret: bool, precision=None):
    @jax.custom_vjp
    def f(wts, bs, xs_t, bt):
        return _fwd_pallas_ff(
            wts, bs, xs_t, bt, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )

    def f_fwd(wts, bs, xs_t, bt):
        return f(wts, bs, xs_t, bt), (wts, bs, xs_t, bt)

    def f_bwd(res, g):
        wts, bs, xs_t, bt = res
        grads = _bwd_pallas_ff(
            wts, bs, xs_t, g, bt, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )
        d_wts = tuple(grads[2 * l] for l in range(n_layers))
        d_bs = tuple(grads[2 * l + 1] for l in range(n_layers))
        return d_wts, d_bs, jnp.zeros_like(xs_t), jnp.zeros_like(bt)

    f.defvjp(f_fwd, f_bwd)
    return f


def pallas_ff_value_and_jac(
    b_mat,
    params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused kernel variant of ``models.mlp.ff_value_and_jac`` (Fourier
    embedding runs in-kernel; same signature with the fixed B first).
    Bind B with functools.partial to get the standard value_and_jac
    signature.  Same parameter-gradients-only VJP contract as
    ``pallas_value_and_jac``: cotangents w.r.t. ``x`` (and B) are zeros,
    not the true input gradient."""
    p, n_in = x.shape
    n_layers = len(params)
    if n_layers < 2:  # linear head on the embedding — nothing to fuse
        from ..models.mlp import ff_value_and_jac

        return ff_value_and_jac(b_mat, params, x, activation, scale, shift)
    # VMEM cap: the FF backward holds 2F-wide embedding/jacobian panels in
    # addition to the [H, T] per-layer state, so the tile must be sized to
    # the WIDER of the two (ADVICE r1: the fixed 4096 tile overflowed the
    # scoped-VMEM budget at large F exactly like the plain path pre-fix).
    h_max = max(l["w"].shape[1] for l in params)
    h_eff = max(2 * b_mat.shape[1], h_max)
    tile = _auto_tile(tile, h_eff, n_layers, n_in,
                      budget_bytes=_vjp_budget(h_eff, n_in))
    f = _fused_fn_ff(n_in, n_layers, activation, tile, bool(interpret),
                     precision)

    xs = x if scale is None else (x - shift) * scale
    xs_t = jnp.transpose(xs).astype(jnp.float32)
    p_pad = _round_up(max(p, 1), tile)
    if p_pad != p:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, p_pad - p)))
    bt = (2.0 * jnp.pi) * jnp.transpose(b_mat).astype(jnp.float32)
    wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32) for l in params)
    bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32) for l in params)
    out = f(wts, bs, xs_t, bt)
    u = out[0, :p]
    du_scaled = out[1:, :p]
    if scale is not None:
        du_scaled = du_scaled * scale[:, None].astype(du_scaled.dtype)
    return u, jnp.transpose(du_scaled)


# ---------------------------------------------------------------------- #
# public API


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=16)
def _fused_fn(n_in: int, n_layers: int, activation: str, tile: int,
              interpret: bool, precision=None):
    """custom_vjp'd fused evaluation on PADDED transposed inputs.

    f(wts_tuple, bs_tuple, xs_t) -> out [1 + n_in, P].
    Weights arrive TRANSPOSED ([out, in]) with 2-D biases ([out, 1]).
    """

    @jax.custom_vjp
    def f(wts, bs, xs_t):
        return _fwd_pallas(
            wts, bs, xs_t, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )

    def f_fwd(wts, bs, xs_t):
        return f(wts, bs, xs_t), (wts, bs, xs_t)

    def f_bwd(res, g):
        wts, bs, xs_t = res
        grads = _bwd_pallas(
            wts, bs, xs_t, g, n_in=n_in, tile=tile,
            activation=activation, precision=precision, interpret=interpret,
        )
        d_wts = tuple(grads[2 * l] for l in range(n_layers))
        d_bs = tuple(grads[2 * l + 1] for l in range(n_layers))
        return d_wts, d_bs, jnp.zeros_like(xs_t)

    f.defvjp(f_fwd, f_bwd)
    return f


def pallas_value_and_jac(
    params,
    x: jax.Array,
    activation: str = "tanh",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """(u, du/dx) at x: [P, n_in] -> ([P], [P, n_in]).

    Drop-in replacement for ``models.mlp.mlp_value_and_jac`` (same
    signature, same semantics: jacobian w.r.t. the ORIGINAL unscaled
    inputs) — with ONE contract difference: the custom VJP provides
    gradients w.r.t. the PARAMETERS only; differentiating through ``x``
    yields zeros, not the true input cotangent (the training loss never
    needs it — quadrature coords are constants).  Callers that need
    d/dx of the loss (trainable collocation points, grad-of-grad) must
    use the XLA path.  Pass ``value_and_jac=pallas_value_and_jac`` to
    ``make_loss_fn`` / ``VarNet.train``.
    """
    p, n_in = x.shape
    n_layers = len(params)
    if n_layers < 2:  # no hidden layer — nothing to fuse
        from ..models.mlp import mlp_value_and_jac

        return mlp_value_and_jac(params, x, activation, scale, shift)
    h_max = max(l["w"].shape[1] for l in params)
    tile = _auto_tile(tile, h_max, n_layers, n_in,
                      budget_bytes=_vjp_budget(h_max, n_in))
    f = _fused_fn(n_in, n_layers, activation, tile, bool(interpret), precision)

    xs = x if scale is None else (x - shift) * scale
    xs_t = jnp.transpose(xs).astype(jnp.float32)  # [n_in, P]
    p_pad = _round_up(max(p, 1), tile)
    if p_pad != p:
        xs_t = jnp.pad(xs_t, ((0, 0), (0, p_pad - p)))

    wts = tuple(jnp.transpose(l["w"]).astype(jnp.float32) for l in params)
    bs = tuple(jnp.reshape(l["b"], (-1, 1)).astype(jnp.float32) for l in params)

    out = f(wts, bs, xs_t)  # [1 + n_in, p_pad]
    u = out[0, :p]
    du_scaled = out[1:, :p]  # d/d(xs) — chain back to original coords
    if scale is not None:
        du_scaled = du_scaled * scale[:, None].astype(du_scaled.dtype)
    return u, jnp.transpose(du_scaled)
