"""Fully-fused weak-residual kernel vs the compositional path
(value+jacobian -> einsum contraction), values AND parameter gradients.
Interpreter mode on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.models.mlp import init_mlp, make_input_scaling, mlp_value_and_jac
from varnet_tpu.ops.pallas_residual import pallas_fused_residual
from varnet_tpu.ops.residual import weak_residual
from varnet_tpu.problems.analytic import (
    steady_ad_3d,
    steady_adr_1d,
    transient_ad_2d,
)


def _reference_r(params, quad, st, scale, shift, td, react):
    k, nq, _ = quad.coords.shape
    d = st.n_space
    flat = quad.coords.reshape(k * nq, st.n_inputs)
    u, du = mlp_value_and_jac(params, flat, "tanh", scale, shift)
    gu = du[:, :d].reshape(k, nq, d)
    ut = du[:, d].reshape(k, nq) if td else None
    return weak_residual(
        gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel, quad.src, ut,
        u=u.reshape(k, nq) if react else None,
        react=quad.react if react else None,
    )


CASES = [
    ("2dt", transient_ad_2d, True, False, 8, dict(t_disc_num=4, b_disc_num=4), 49),
    ("adr1d", steady_adr_1d, False, True, 16, dict(), 15),
    # 3-D steady (beyond-reference geometry): same n_in/nQ as 2dt, so the
    # TPU hot path needs no new layouts — this pins that it stays true.
    ("3d", steady_ad_3d, False, False, 4, dict(b_disc_num=3), 27),
]


@pytest.mark.slow
def test_fused_residual_sin_activation():
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    from varnet_tpu.models.mlp import init_siren

    params = init_siren(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    k, nq, _ = quad.coords.shape
    d = st.n_space
    flat = quad.coords.reshape(k * nq, st.n_inputs)
    u, du = mlp_value_and_jac(params, flat, "sin", scale, shift)
    gu = du[:, :d].reshape(k, nq, d)
    ut = du[:, d].reshape(k, nq)
    r_ref = weak_residual(gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel,
                          quad.src, ut)
    r = pallas_fused_residual(params, quad, "sin", scale, shift,
                              time_dependent=True, tile=49, interpret=True)
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("directional", [True, False],
                         ids=["directional", "jacobian"])
@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile", CASES,
                         ids=[c[0] for c in CASES])
def test_fused_residual_matches_reference(name, case_fn, td, react, disc, kw,
                                          tile, directional):
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)

    r_ref = _reference_r(params, quad, st, scale, shift, td, react)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift,
        time_dependent=td, has_react=react, tile=tile, interpret=True,
        directional=directional,
    )
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("directional", [True, False],
                         ids=["directional", "jacobian"])
@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_fused_residual_param_grads(name, case_fn, td, react, disc, kw, tile,
                                    directional):
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    k = quad.coords.shape[0]
    cw = jax.random.normal(jax.random.PRNGKey(5), (k,))

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, td, react)
        return jnp.sum(r * cw) + jnp.sum(r * r)

    def loss_fused(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift,
            time_dependent=td, has_react=react, tile=tile, interpret=True,
            directional=directional,
        )
        return jnp.sum(r * cw) + jnp.sum(r * r)

    g1 = jax.grad(loss_ref)(params)
    g2 = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


@pytest.mark.parametrize("g", [2, 3, 4])
@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_qblocked_residual_matches_reference(name, case_fn, td, react, disc,
                                             kw, tile, g):
    """The q-blocked directional kernel (G quadrature points per program,
    block-diagonal weights — round-3 MXU-pass optimization) matches the
    compositional path in values and parameter gradients.  g=3 forces
    nq padding (nq = 2^(d+1) never divides by 3)."""
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)

    r_ref = _reference_r(params, quad, st, scale, shift, td, react)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift,
        time_dependent=td, has_react=react, tile=tile, interpret=True,
        q_block=g,
    )
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)

    k = quad.coords.shape[0]
    cw = jax.random.normal(jax.random.PRNGKey(5), (k,))

    def loss_ref(p):
        rr = _reference_r(p, quad, st, scale, shift, td, react)
        return jnp.sum(rr * cw) + jnp.sum(rr * rr)

    def loss_fused(p):
        rr = pallas_fused_residual(
            p, quad, "tanh", scale, shift,
            time_dependent=td, has_react=react, tile=tile, interpret=True,
            q_block=g,
        )
        return jnp.sum(rr * cw) + jnp.sum(rr * rr)

    g1 = jax.grad(loss_ref)(params)
    g2 = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


@pytest.mark.parametrize("g", [1, 2])
@pytest.mark.slow
def test_prepared_layout_matches_ingraph(g):
    """prepare_residual_layout (host NumPy) must reproduce the in-graph
    transform exactly: same residual AND same gradients through the
    prepared path (the trainer threads it per shard — api.train)."""
    from varnet_tpu.ops.pallas_residual import (
        prepare_residual_layout, resolve_layout,
    )

    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    tile = 49

    # host-side prepare from the RAW NumPy fixed data
    xs_np, flds_np = prepare_residual_layout(
        fd.quad, np.asarray(scale), np.asarray(shift), has_react=False,
        G=g, tile=tile,
    )
    assert isinstance(xs_np, np.ndarray)
    prepared = (jnp.asarray(xs_np), jnp.asarray(flds_np))

    r_plain = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True,
        tile=tile, interpret=True, q_block=g,
    )
    r_prep = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True,
        tile=tile, interpret=True, q_block=g, prepared=prepared,
    )
    np.testing.assert_allclose(r_prep, r_plain, rtol=1e-6, atol=1e-9)

    def loss(p, prep):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=True,
            tile=tile, interpret=True, q_block=g, prepared=prep,
        )
        return jnp.sum(r * r)

    g1 = jax.grad(loss)(params, None)
    g2 = jax.grad(loss)(params, prepared)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_train_step_with_prepared_matches(tmp_path):
    """End-to-end: the shard_map train step with the prepared layout
    threaded (stacked per-shard) reproduces the unprepared trajectory."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from varnet_tpu.fem.assembly import pad_points, pad_quad, QuadData
    from varnet_tpu.ops.pallas_residual import prepare_residual_layout
    from varnet_tpu.parallel.mesh import (
        DATA_AXIS, make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.problems.analytic import steady_ad_1d
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step

    case = steady_ad_1d(kappa=0.2)
    fd = build_fixed_data(case["pde"], 15)
    n_sh = 2
    mesh = make_mesh(n_sh)
    quad_h = pad_quad(fd.quad, n_sh)
    quad = shard_quad(quad_h, mesh)
    bc = shard_points(pad_points(fd.bc, n_sh), mesh)
    scale = shift = None
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=14, interpret=True, q_block=2,
    )
    loss_fn = make_loss_fn(fd.static, fused_residual=fused,
                           input_scaling=True)

    # per-shard host prepare, stacked
    from varnet_tpu.models.mlp import make_input_scaling as mis

    sc, sh = mis(fd.static.input_lo, fd.static.input_hi)
    ks = quad_h.coords.shape[0] // n_sh
    parts = []
    for s in range(n_sh):
        sl = slice(s * ks, (s + 1) * ks)
        shard = QuadData(coords=quad_h.coords[sl], N=quad_h.N, dN=quad_h.dN,
                         w=quad_h.w, kappa=quad_h.kappa[sl],
                         vel=quad_h.vel[sl], src=quad_h.src[sl],
                         react=quad_h.react[sl], mask=quad_h.mask[sl])
        parts.append(prepare_residual_layout(
            shard, np.asarray(sc), np.asarray(sh), has_react=False, G=2,
            tile=14,
        ))
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    prepared = (
        jax.device_put(np.stack([p[0] for p in parts]), sharding),
        jax.device_put(np.stack([p[1] for p in parts]), sharding),
    )

    opt = make_optimizer(OptimizerConfig())
    theta0 = replicate(init_mlp(jax.random.PRNGKey(0), 1, (8, 8)), mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

    def run(prep):
        theta = jax.tree_util.tree_map(jnp.copy, theta0)
        opt_state = replicate(opt.init(theta), mesh)
        step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
        losses = []
        for _ in range(5):
            theta, opt_state, aux = step(theta, opt_state, quad, bc, None,
                                         None, w, prep)
            losses.append(float(aux["loss"]))
        return losses

    np.testing.assert_allclose(run(prepared), run(None), rtol=1e-6)


def test_qblocked_deep_and_sin():
    """3-hidden-layer SIREN net through the q-blocked kernel (exercises
    the multi-hidden blocked loop and the sin activation pair)."""
    from varnet_tpu.models.mlp import init_siren

    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_siren(jax.random.PRNGKey(2), st.n_inputs, (12, 12, 12))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)

    k, nq, _ = quad.coords.shape
    flat = quad.coords.reshape(k * nq, st.n_inputs)
    u, du = mlp_value_and_jac(params, flat, "sin", scale, shift)
    gu = du[:, : st.n_space].reshape(k, nq, st.n_space)
    ut = du[:, st.n_space].reshape(k, nq)
    r_ref = weak_residual(gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel,
                          quad.src, ut)
    r = pallas_fused_residual(params, quad, "sin", scale, shift,
                              time_dependent=True, tile=49, interpret=True,
                              q_block=4)
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("directional", [True, False],
                         ids=["directional", "jacobian"])
@pytest.mark.slow
def test_fused_residual_mor_matches_reference(directional):
    """Parametric (MOR) problems are fused-kernel eligible (VERDICT r2
    next #5): the mu coordinate rows get a zero contraction direction, so
    values AND parameter gradients must match the general path."""
    from varnet_tpu.problems.analytic import mor_steady_ad_2d

    case = mor_steady_ad_2d(vels=(0.5, 1.5))
    fd = build_fixed_data(case["pde"], 6, b_disc_num=4)
    st = fd.static
    assert st.n_mor == 1
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    tile = 25

    r_ref = _reference_r(params, quad, st, scale, shift, False, False)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift,
        time_dependent=False, has_react=False, tile=tile, interpret=True,
        directional=directional,
    )
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)

    k = quad.coords.shape[0]
    cw = jax.random.normal(jax.random.PRNGKey(5), (k,))

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, False, False)
        return jnp.sum(r * cw) + jnp.sum(r * r)

    def loss_fused(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift,
            time_dependent=False, has_react=False, tile=tile,
            interpret=True, directional=directional,
        )
        return jnp.sum(r * cw) + jnp.sum(r * r)

    g1 = jax.grad(loss_ref)(params)
    g2 = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_varnet_trains_with_fused_residual():
    """End-to-end: force the fused path on the CPU backend (interpret off is
    TPU-only, so use the hook manually with interpret=True)."""
    import functools

    from varnet_tpu.api import VarNet
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step
    from varnet_tpu.fem.assembly import pad_points, pad_quad
    from varnet_tpu.parallel.mesh import make_mesh, replicate, shard_points, shard_quad
    from varnet_tpu.problems.analytic import steady_ad_1d

    case = steady_ad_1d(kappa=0.2)
    fd = build_fixed_data(case["pde"], 15)
    mesh = make_mesh(1)
    quad = shard_quad(pad_quad(fd.quad, 1), mesh)
    bc = shard_points(pad_points(fd.bc, 1), mesh)
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=14, interpret=True,
    )
    loss_fn = make_loss_fn(fd.static, fused_residual=fused)
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(init_mlp(jax.random.PRNGKey(0), 1, (8, 8)), mesh)
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    losses = []
    for _ in range(30):
        theta, opt_state, aux = step(theta, opt_state, quad, bc, None, None, w)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_fused_residual_3d_transient():
    """3-D TRANSIENT through the directional kernel (n_in = 4, nQ = 256):
    one combined value + parameter-gradient check vs the compositional
    reference (the full matrix runs on the cheaper cases above)."""
    from varnet_tpu.problems.analytic import transient_ad_3d

    case = transient_ad_3d()
    fd = build_fixed_data(case["pde"], 4, t_disc_num=3, b_disc_num=3)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(2), st.n_inputs, (12, 12))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    k = quad.coords.shape[0]
    cw = jax.random.normal(jax.random.PRNGKey(7), (k,))

    r_ref = _reference_r(params, quad, st, scale, shift, True, False)
    r = pallas_fused_residual(params, quad, "tanh", scale, shift,
                              time_dependent=True, tile=27, interpret=True)
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-8)

    def loss(fn):
        def f(p):
            rr = fn(p)
            return jnp.sum(rr * cw) + jnp.sum(rr * rr)
        return f

    g1 = jax.grad(loss(lambda p: _reference_r(
        p, quad, st, scale, shift, True, False)))(params)
    g2 = jax.grad(loss(lambda p: pallas_fused_residual(
        p, quad, "tanh", scale, shift, time_dependent=True, tile=27,
        interpret=True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


# ---------------------------------------------------------------------- #
# Fourier-embedded directional kernel (round 3): the embedding and its
# directional tangent run in-kernel (_embed_dir), so FF configs (the
# contaminant flagship) keep the fully-fused hot path.


def _ff_reference_r(b, params, quad, st, scale, shift, td):
    from varnet_tpu.models.mlp import ff_value_and_jac

    k, nq, _ = quad.coords.shape
    d = st.n_space
    flat = quad.coords.reshape(k * nq, st.n_inputs)
    u, du = ff_value_and_jac(b, params, flat, "tanh", scale, shift)
    gu = du[:, :d].reshape(k, nq, d)
    ut = du[:, d].reshape(k, nq) if td else None
    return weak_residual(
        gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel, quad.src, ut
    )


def _ff_case(multiscale=False):
    from varnet_tpu.models.mlp import make_fourier_features

    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    b = make_fourier_features(
        jax.random.PRNGKey(3), st.n_inputs, 8,
        scale=(0.5, 2.0) if multiscale else 0.7,
    )
    params = init_mlp(jax.random.PRNGKey(0), 16, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    bt = (2.0 * jnp.pi) * jnp.transpose(b).astype(jnp.float32)
    return b, bt, params, quad, st, scale, shift


@pytest.mark.parametrize("multiscale", [False, True],
                         ids=["single-scale", "multi-scale"])
def test_fused_residual_fourier_matches_reference(multiscale):
    b, bt, params, quad, st, scale, shift = _ff_case(multiscale)
    r_ref = _ff_reference_r(b, params, quad, st, scale, shift, True)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True, tile=49,
        interpret=True, fourier_bt=bt,
    )
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_fused_residual_fourier_param_grads():
    b, bt, params, quad, st, scale, shift = _ff_case()

    def loss_kernel(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=True, tile=49,
            interpret=True, fourier_bt=bt,
        )
        return jnp.sum(r**2)

    def loss_ref(p):
        return jnp.sum(_ff_reference_r(b, p, quad, st, scale, shift, True) ** 2)

    gk = jax.grad(loss_kernel)(params)
    gr = jax.grad(loss_ref)(params)
    for lk, lr in zip(gk, gr):
        for key in ("w", "b"):
            np.testing.assert_allclose(
                lk[key], lr[key],
                rtol=1e-4, atol=1e-6 * float(jnp.max(jnp.abs(lr[key])) + 1),
            )


def test_fused_residual_fourier_validation():
    b, bt, params, quad, st, scale, shift = _ff_case()
    with pytest.raises(ValueError, match="directional"):
        pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=True,
            tile=49, interpret=True, fourier_bt=bt, directional=False,
        )
    with pytest.raises(ValueError, match="q_block"):
        pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=True,
            tile=49, interpret=True, fourier_bt=bt, q_block=2,
        )
    with pytest.raises(ValueError, match="precoeff"):
        pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=True,
            tile=49, interpret=True, fourier_bt=bt, precoeff=True,
        )


def test_varnet_fourier_hook_selected():
    """Hot-path selection: an FF VarNet on the (simulated) TPU backend gets
    the fused kernel with fourier_bt bound; precoeff keeps the fallback."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_2d

    case = steady_ad_2d(kappa=0.1)
    vn = VarNet(case["pde"], layer_width=(16, 16), disc_num=10,
                n_devices=1, fourier_features=8, use_pallas=True)
    hook = vn._fused_residual_hook(None)
    assert hook is not None
    assert hook.keywords["fourier_bt"].shape == (8, 2)
    vn2 = VarNet(case["pde"], layer_width=(16, 16), disc_num=10,
                 n_devices=1, fourier_features=8, use_pallas=True,
                 fused_precoeff=True)
    assert vn2._fused_residual_hook(None) is None


def test_varnet_trains_with_fourier_fused_residual():
    """End-to-end on the CPU backend: FF net + fused residual kernel
    (interpret mode) through make_loss_fn, loss decreases."""
    import functools

    from varnet_tpu.models.mlp import ff_apply, make_fourier_features
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step
    from varnet_tpu.fem.assembly import pad_points, pad_quad
    from varnet_tpu.parallel.mesh import (
        make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.problems.analytic import steady_ad_1d

    case = steady_ad_1d(kappa=0.2)
    fd = build_fixed_data(case["pde"], 15)
    mesh = make_mesh(1)
    quad = shard_quad(pad_quad(fd.quad, 1), mesh)
    bc = shard_points(pad_points(fd.bc, 1), mesh)
    b = make_fourier_features(jax.random.PRNGKey(5), 1, 6, scale=0.5)
    bt = (2.0 * jnp.pi) * jnp.transpose(b).astype(jnp.float32)
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=14, interpret=True, fourier_bt=bt,
    )
    loss_fn = make_loss_fn(
        fd.static, fused_residual=fused,
        apply_fn=functools.partial(ff_apply, b),
    )
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(init_mlp(jax.random.PRNGKey(0), 12, (8, 8)), mesh)
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    losses = []
    for _ in range(30):
        theta, opt_state, aux = step(theta, opt_state, quad, bc, None, None, w)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------- #
# Inverse-source mode on the fused kernel (round 3): the trainable source
# enters the weak residual linearly, so the kernel integrates with the
# fixed source ZEROED and the loss adds the -s N w term XLA-side.


@pytest.mark.slow
def test_fused_loss_with_source_fn_matches_general():
    """make_loss_fn(fused + source_fn) == make_loss_fn(general + source_fn):
    loss values and gradients w.r.t. BOTH the net and the source params."""
    import functools

    from varnet_tpu.models.source import make_gaussian_source
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.fem.assembly import pad_points, pad_quad
    from varnet_tpu.parallel.mesh import (
        make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.problems.analytic import inverse_source_2d

    case = inverse_source_2d(kappa=0.1, n_obs=20)
    fd = build_fixed_data(case["pde"], 8)
    st = fd.static
    mesh = make_mesh(1)
    quad_gen = shard_quad(pad_quad(fd.quad, 1), mesh)
    # fused path contract: the fixed source field is zeroed by the trainer
    quad_fused = quad_gen._replace(src=jnp.zeros_like(quad_gen.src))
    bc = shard_points(pad_points(fd.bc, 1), mesh)
    source_fn, phi0 = make_gaussian_source(2)
    theta = {
        "net": init_mlp(jax.random.PRNGKey(0), st.n_inputs, (8, 8)),
        "src": phi0,
    }
    k = fd.quad.coords.shape[0]
    tile = k  # one padded tile
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=tile, interpret=True,
    )
    loss_fused = make_loss_fn(st, source_fn=source_fn, fused_residual=fused)
    loss_gen = make_loss_fn(st, source_fn=source_fn)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

    vf, auxf = loss_fused(theta, quad_fused, bc, None, None, w)
    vg, auxg = loss_gen(theta, quad_gen, bc, None, None, w)
    np.testing.assert_allclose(float(vf), float(vg), rtol=1e-5)

    gf = jax.grad(lambda th: loss_fused(th, quad_fused, bc, None, None, w)[0])(theta)
    gg = jax.grad(lambda th: loss_gen(th, quad_gen, bc, None, None, w)[0])(theta)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=1e-6 * float(jnp.max(jnp.abs(b)) + 1)
        )


def test_varnet_source_fn_hook_selected():
    """Inverse-source VarNets now keep the fused hot path (the hook no
    longer bails on source_fn); the trainer zeroes the fixed source."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.models.source import make_gaussian_source
    from varnet_tpu.fem.assembly import PointData
    from varnet_tpu.problems.analytic import inverse_source_2d

    case = inverse_source_2d(kappa=0.1, n_obs=10)
    source_fn, phi0 = make_gaussian_source(2)
    obs = PointData(
        coords=case["obs_x"], values=case["obs_u"],
        mask=np.ones(case["obs_x"].shape[0]),
    )
    vn = VarNet(case["pde"], layer_width=(8, 8), disc_num=8, n_devices=1,
                source_fn=source_fn, source_init=phi0, obs_data=obs,
                use_pallas=True)
    assert vn._fused_residual_hook(None) is not None


@pytest.mark.slow
def test_fused_residual_fourier_mor_matches_reference():
    """Composition pin: Fourier embedding x parametric (MOR) inputs — the
    embedding spans ALL inputs (x and mu), the contraction direction is
    zero on the mu rows, values + parameter grads match the FF general
    path."""
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.problems.analytic import mor_steady_ad_2d

    case = mor_steady_ad_2d(vels=(0.5, 1.5))
    fd = build_fixed_data(case["pde"], 6, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    b = make_fourier_features(jax.random.PRNGKey(3), st.n_inputs, 8, scale=0.6)
    bt = (2.0 * jnp.pi) * jnp.transpose(b).astype(jnp.float32)
    params = init_mlp(jax.random.PRNGKey(0), 16, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    k, nq, _ = quad.coords.shape
    d = st.n_space
    flat = quad.coords.reshape(k * nq, st.n_inputs)

    def ref_r(p):
        u, du = ff_value_and_jac(b, p, flat, "tanh", scale, shift)
        gu = du[:, :d].reshape(k, nq, d)
        return weak_residual(
            gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel, quad.src, None
        )

    r_ref = ref_r(params)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=False,
        tile=25, interpret=True, fourier_bt=bt,
    )
    np.testing.assert_allclose(r, r_ref, rtol=1e-5, atol=1e-7)

    cw = jax.random.normal(jax.random.PRNGKey(5), (k,))

    def loss(fn, p):
        rr = fn(p)
        return jnp.sum(rr * cw) + jnp.sum(rr * rr)

    g1 = jax.grad(lambda p: loss(ref_r, p))(params)
    g2 = jax.grad(lambda p: loss(
        lambda q: pallas_fused_residual(
            q, quad, "tanh", scale, shift, time_dependent=False,
            tile=25, interpret=True, fourier_bt=bt,
        ), p))(params)
    for a, b2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b2, rtol=5e-4, atol=5e-6)


@pytest.mark.parametrize("name,case_fn,td,disc,kw,tile", [
    ("burgers1d", None, False, 16, dict(), 15),
    ("burgers1dt", None, True, 8, dict(t_disc_num=6), 21),
    ("burgers2dt", None, True, 6, dict(t_disc_num=4, b_disc_num=4), 25),
], ids=["burgers1d", "burgers1dt", "burgers2dt"])
@pytest.mark.slow
def test_fused_residual_nl_matches_reference(name, case_fn, td, disc, kw,
                                             tile):
    """Nonlinear advection in the jacobian-panel fused kernel (forward
    AND custom-VJP backward) matches the XLA weak_residual path
    (DESIGN.md decision 16)."""
    from varnet_tpu.problems.analytic import (
        burgers_1d_steady, burgers_1d_transient, burgers_2d_front,
    )

    case = {"burgers1d": burgers_1d_steady,
            "burgers1dt": burgers_1d_transient,
            "burgers2dt": burgers_2d_front}[name]()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), st.n_inputs, (16, 16))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    nl = jnp.asarray(case["pde"].nl_adv, jnp.float32)
    d = st.n_space
    k, nq = quad.coords.shape[:2]

    def r_ref_fn(p):
        flat = quad.coords.reshape(k * nq, st.n_inputs)
        u, du = mlp_value_and_jac(p, flat, "tanh", scale, shift)
        gu = du[:, :d].reshape(k, nq, d)
        ut = du[:, d].reshape(k, nq) if td else None
        return weak_residual(
            gu, quad.N, quad.dN, quad.w, quad.kappa, quad.vel, quad.src,
            ut, u=u.reshape(k, nq), nl_vec=nl,
        )

    def r_fused_fn(p):
        return pallas_fused_residual(
            p, quad, "tanh", scale, shift,
            time_dependent=td, tile=tile, interpret=True,
            directional=False, nl_vec=tuple(np.asarray(case["pde"].nl_adv)),
        )

    np.testing.assert_allclose(r_fused_fn(params), r_ref_fn(params),
                               rtol=1e-5, atol=1e-8)

    cw = jax.random.normal(jax.random.PRNGKey(5), (k,))

    def loss(fn):
        def f(p):
            r = fn(p)
            return jnp.sum(r * cw) + jnp.sum(r * r)
        return f

    g1 = jax.grad(loss(r_ref_fn))(params)
    g2 = jax.grad(loss(r_fused_fn))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_fused_residual_nl_requires_jacobian_panel():
    from varnet_tpu.problems.analytic import burgers_1d_steady

    case = burgers_1d_steady()
    fd = build_fixed_data(case["pde"], 8)
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (8,))
    with pytest.raises(ValueError, match="nl_vec requires"):
        pallas_fused_residual(
            params, quad, "tanh", None, None, time_dependent=False,
            interpret=True, directional=True, nl_vec=(1.0,),
        )


def test_varnet_nl_hot_path_gating():
    """VarNet forces the jacobian-panel variant for nonlinear problems:
    the hook is ELIGIBLE (not None) and carries nl_vec + directional
    False; FF nets fall back to the value+jac path."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import burgers_1d_steady

    case = burgers_1d_steady()
    vn = VarNet(case["pde"], layer_width=(8,), disc_num=8, n_devices=1,
                use_pallas=True)
    assert vn.fused_directional is False
    hook = vn._fused_residual_hook("highest")
    assert hook is not None
    assert hook.keywords["nl_vec"] == (1.0,)
    assert hook.keywords["directional"] is False
    vn_ff = VarNet(case["pde"], layer_width=(8,), disc_num=8, n_devices=1,
                   use_pallas=True, fourier_features=4)
    assert vn_ff._fused_residual_hook("highest") is None


@pytest.mark.slow
def test_varnet_trains_with_fused_nl_residual():
    """End-to-end Burgers through the fused jacobian-panel nl kernel in
    the real train step (interpret mode on CPU)."""
    import functools

    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step
    from varnet_tpu.fem.assembly import pad_points, pad_quad
    from varnet_tpu.parallel.mesh import (
        make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.problems.analytic import burgers_1d_steady

    case = burgers_1d_steady()
    fd = build_fixed_data(case["pde"], 15)
    mesh = make_mesh(1)
    quad = shard_quad(pad_quad(fd.quad, 1), mesh)
    bc = shard_points(pad_points(fd.bc, 1), mesh)
    scale, shift = make_input_scaling(fd.static.input_lo, fd.static.input_hi)
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=14, interpret=True, directional=False, nl_vec=(1.0,),
    )
    loss_fn = make_loss_fn(fd.static, fused_residual=fused,
                           nl_vec=case["pde"].nl_adv)
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(init_mlp(jax.random.PRNGKey(0), 1, (8, 8)), mesh)
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])
    losses = []
    for _ in range(30):
        theta, opt_state, aux = step(theta, opt_state, quad, bc, None, None, w)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]

    # and the fused-vs-XLA loss values agree at the same theta
    loss_xla = make_loss_fn(fd.static, nl_vec=case["pde"].nl_adv)
    l1, _ = loss_xla(jax.device_get(theta), fd.quad, fd.bc, None, None, w)
    l2, _ = loss_fn(jax.device_get(theta), fd.quad, fd.bc, None, None, w)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
