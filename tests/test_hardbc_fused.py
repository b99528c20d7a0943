"""Hard-BC fold into the precoeff fused-residual kernel.

The exact-imposition ansatz u = A + B n is AFFINE in the raw network
outputs, so the transformed weak residual is the SAME kernel contraction
with different precomputed coefficients (prepare_residual_coeffs
``hard=`` — grad/time rows scaled by B, the n-coefficient on cu, the
theta-independent A-part on the additive csrc).  These tests pin that
fold against the compositional reference (value+jac -> hard_transform ->
weak_residual), values AND parameter gradients, shared and per-node
tables, G = 1 and q-blocked, prepared-data reuse, loss-level wiring, and
the api hot-path gating.  Interpreter mode on the CPU backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.fem.assembly import PointData, QuadData, build_fixed_data
from varnet_tpu.fem.hardbc import HardBC, hard_transform
from varnet_tpu.models.mlp import (
    init_mlp,
    make_input_scaling,
    mlp_value_and_jac,
)
from varnet_tpu.ops.pallas_residual import (
    pallas_fused_residual,
    prepare_residual_coeffs,
    resolve_layout,
)
from varnet_tpu.ops.residual import weak_residual
from varnet_tpu.problems.analytic import (
    mor_steady_ad_2d,
    steady_ad_2d,
    steady_ad_3d,
    steady_adr_1d,
    transient_ad_1d,
    transient_ad_2d,
)


def _hard_reference_r(params, quad, st, scale, shift, td, react, hq):
    """Compositional hard-BC residual: raw net -> ansatz -> weak form."""
    k, nq, _ = quad.coords.shape
    d = st.n_space
    flat = quad.coords.reshape(k * nq, st.n_inputs)
    u, du = mlp_value_and_jac(params, flat, "tanh", scale, shift)
    gu = du[:, :d].reshape(k, nq, d)
    ut = du[:, d].reshape(k, nq) if td else None
    u2, gu, ut = hard_transform(u.reshape(k, nq), gu, ut, hq)
    return weak_residual(
        gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel, quad.src, ut,
        u=u2 if react else None,
        react=quad.react if react else None,
    )


def _setup(case_fn, disc, kw, order=1):
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, test_order=order, **kw)
    st = fd.static
    hb = HardBC(case["pde"])
    hq_host = hb.tables(np.asarray(fd.quad.coords))
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    hq = jax.tree_util.tree_map(jnp.asarray, hq_host)
    params = init_mlp(jax.random.PRNGKey(1), st.n_inputs, (12, 12))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    return case, fd, st, quad, hq, hq_host, params, scale, shift


CASES = [
    ("1dt", transient_ad_1d, True, False, 12, dict(t_disc_num=4), 21, 1, 1),
    ("2d-g2", steady_ad_2d, False, False, 8, dict(b_disc_num=4), 21, 2, 1),
    ("2dt", transient_ad_2d, True, False, 6,
     dict(t_disc_num=3, b_disc_num=4), 25, 1, 1),
    ("adr1d", steady_adr_1d, False, True, 16, dict(), 15, 1, 1),
    ("3d-g2", steady_ad_3d, False, False, 4, dict(b_disc_num=3), 27, 2, 1),
    ("mor2d", mor_steady_ad_2d, False, False, 6, dict(b_disc_num=4), 25, 1,
     1),
    ("1dt-o2", transient_ad_1d, True, False, 10, dict(t_disc_num=4), 19, 1,
     2),
]


@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile,g,order",
                         CASES, ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_hard_fused_matches_reference(name, case_fn, td, react, disc, kw,
                                      tile, g, order):
    _, _, st, quad, hq, _, params, scale, shift = _setup(
        case_fn, disc, kw, order)
    r_ref = _hard_reference_r(params, quad, st, scale, shift, td, react, hq)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=td,
        has_react=react, tile=tile, interpret=True, q_block=g,
        precoeff=True, hard=hq,
    )
    np.testing.assert_allclose(r, r_ref, rtol=3e-5, atol=2e-6)


@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile,g,order",
                         CASES[:4], ids=[c[0] for c in CASES[:4]])
@pytest.mark.slow
def test_hard_fused_param_grads(name, case_fn, td, react, disc, kw, tile,
                                g, order):
    _, _, st, quad, hq, _, params, scale, shift = _setup(
        case_fn, disc, kw, order)

    def loss_k(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=td,
            has_react=react, tile=tile, interpret=True, q_block=g,
            precoeff=True, hard=hq,
        )
        return jnp.sum((r * quad.mask) ** 2)

    def loss_ref(p):
        r = _hard_reference_r(p, quad, st, scale, shift, td, react, hq)
        return jnp.sum((r * quad.mask) ** 2)

    g_k = jax.grad(loss_k)(params)
    g_ref = jax.grad(loss_ref)(params)
    for lk, lr in zip(g_k, g_ref):
        for key in ("w", "b"):
            np.testing.assert_allclose(lk[key], lr[key], rtol=2e-4,
                                       atol=2e-6)


def test_hard_fused_prepared_reuse():
    """Host-prepared hard coefficients == prepare-in-graph fallback, and
    the prepared tuple carries the cu operand even with has_react=False
    (the kernel's cu flag is has_react OR hard)."""
    name, case_fn, td, react, disc, kw, tile, g, order = CASES[0]
    _, _, st, quad, hq, hq_host, params, scale, shift = _setup(
        case_fn, disc, kw, order)
    G, tile_r = resolve_layout(12, quad.coords.shape[1], 3, st.n_inputs,
                               interpret=True, tile=tile, q_block=g)
    prep = prepare_residual_coeffs(
        quad, scale, shift, time_dependent=td, has_react=react, G=G,
        tile=tile_r, hard=hq,
    )
    assert len(prep) == 4  # xs, cdir, csrc, cu
    r_prep = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=td,
        has_react=react, tile=tile, interpret=True, q_block=g,
        precoeff=True, hard=hq, prepared=prep,
    )
    r_graph = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=td,
        has_react=react, tile=tile, interpret=True, q_block=g,
        precoeff=True, hard=hq,
    )
    np.testing.assert_allclose(r_prep, r_graph, rtol=1e-6, atol=1e-8)


def test_hard_requires_precoeff():
    name, case_fn, td, react, disc, kw, tile, g, order = CASES[0]
    _, _, st, quad, hq, _, params, scale, shift = _setup(
        case_fn, disc, kw, order)
    with pytest.raises(ValueError, match="precoeff"):
        pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=td,
            has_react=react, tile=tile, interpret=True, q_block=1,
            precoeff=False, hard=hq,
        )


@pytest.mark.slow
def test_hard_fused_loss_wiring():
    """make_loss_fn(hard_mode=True, fused_residual=precoeff kernel) ==
    the value+jac hard path: total loss AND parameter gradients agree,
    BC/IC rows report 0.0 on both."""
    from varnet_tpu.train.loss import make_loss_fn

    name, case_fn, td, react, disc, kw, tile, g, order = CASES[0]
    case, fd, st, quad, hq, hq_host, params, scale, shift = _setup(
        case_fn, disc, kw, order)
    bc = jax.tree_util.tree_map(jnp.asarray, fd.bc)
    ic = jax.tree_util.tree_map(jnp.asarray, fd.ic)
    hb = HardBC(case["pde"])
    hard = (hq, None, None)
    weights = jnp.asarray([1.0, 10.0, 10.0, 0.0])

    fused = functools.partial(
        pallas_fused_residual, time_dependent=td, has_react=react,
        tile=tile, interpret=True, q_block=g, precoeff=True,
    )
    loss_fused = make_loss_fn(st, hard_mode=True, fused_residual=fused)
    loss_ref = make_loss_fn(st, hard_mode=True)

    tot_f, aux_f = loss_fused(params, quad, bc, ic, None, weights,
                              hard=hard)
    tot_r, aux_r = loss_ref(params, quad, bc, ic, None, weights, hard=hard)
    np.testing.assert_allclose(tot_f, tot_r, rtol=3e-5)
    assert float(aux_f["loss_bc"]) == 0.0 and float(aux_f["loss_ic"]) == 0.0

    g_f = jax.grad(lambda p: loss_fused(p, quad, bc, ic, None, weights,
                                        hard=hard)[0])(params)
    g_r = jax.grad(lambda p: loss_ref(p, quad, bc, ic, None, weights,
                                      hard=hard)[0])(params)
    for lf, lr in zip(g_f, g_r):
        for key in ("w", "b"):
            np.testing.assert_allclose(lf[key], lr[key], rtol=3e-4,
                                       atol=3e-7)


def test_api_gating_hard_selects_precoeff():
    """VarNet(hard_bc=True) hot path: plain MLP -> precoeff fused hook;
    FF / nonlinear-advection / trainable-coefficient combinations keep
    the value+jac path (hook None)."""
    case = transient_ad_1d()
    from varnet_tpu.api import VarNet

    vn = VarNet(case["pde"], layer_width=(8, 8), disc_num=6, t_disc_num=3,
                n_devices=1, hard_bc=True, use_pallas=True)
    hook = vn._fused_residual_hook(None)
    assert hook is not None and hook.keywords["precoeff"] is True

    vn_ff = VarNet(case["pde"], layer_width=(8, 8), disc_num=6,
                   t_disc_num=3, n_devices=1, hard_bc=True,
                   use_pallas=True, fourier_features=4)
    assert vn_ff._fused_residual_hook(None) is None

    from varnet_tpu.problems.analytic import burgers_1d_transient

    bcase = burgers_1d_transient(nu=0.05, a=0.4, c=0.6)
    vn_nl = VarNet(bcase["pde"], layer_width=(8, 8), disc_num=6,
                   t_disc_num=3, n_devices=1, hard_bc=True,
                   use_pallas=True)
    assert vn_nl._fused_residual_hook(None) is None
