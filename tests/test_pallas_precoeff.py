"""Precomputed-coefficient fused-residual kernel (pallas_residual.py
'PRECOMPUTED-COEFFICIENT' section): values and parameter gradients vs the
compositional reference, shared AND per-node (order-2) tables, G = 1 and
q-blocked, prepared-data reuse.  Interpreter mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.fem.assembly import build_fixed_data
from varnet_tpu.models.mlp import init_mlp, make_input_scaling, mlp_value_and_jac
from varnet_tpu.ops.pallas_residual import (
    pallas_fused_residual,
    prepare_residual_coeffs,
    resolve_layout,
)
from varnet_tpu.ops.residual import weak_residual
from varnet_tpu.problems.analytic import (
    mor_steady_ad_2d,
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
    ("2dt", transient_ad_2d, True, False, 8,
     dict(t_disc_num=4, b_disc_num=4), 49, 1),
    ("2dt-g2", transient_ad_2d, True, False, 8,
     dict(t_disc_num=4, b_disc_num=4), 49, 2),
    ("adr1d", steady_adr_1d, False, True, 16, dict(), 15, 1),
    ("adr1d-g2", steady_adr_1d, False, True, 16, dict(), 15, 2),
    ("3d-g2", steady_ad_3d, False, False, 4, dict(b_disc_num=3), 27, 2),
]


@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile,g", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_precoeff_matches_reference(name, case_fn, td, react, disc, kw,
                                    tile, g):
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(1), st.n_inputs, (12, 12))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    r_ref = _reference_r(params, quad, st, scale, shift, td, react)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=td,
        has_react=react, tile=tile, interpret=True, q_block=g,
        precoeff=True,
    )
    np.testing.assert_allclose(r, r_ref, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("name,case_fn,td,react,disc,kw,tile,g", CASES,
                         ids=[c[0] for c in CASES])
@pytest.mark.slow
def test_precoeff_param_grads(name, case_fn, td, react, disc, kw, tile, g):
    case = case_fn()
    fd = build_fixed_data(case["pde"], disc, **kw)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(2), st.n_inputs, (12, 12))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)

    def loss_k(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=td,
            has_react=react, tile=tile, interpret=True, q_block=g,
            precoeff=True,
        )
        return jnp.sum((r * quad.mask) ** 2)

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, td, react)
        return jnp.sum((r * quad.mask) ** 2)

    gk = jax.grad(loss_k)(params)
    gref = jax.grad(loss_ref)(params)
    for lk, lr in zip(gk, gref):
        np.testing.assert_allclose(lk["w"], lr["w"], rtol=5e-4, atol=1e-7)
        np.testing.assert_allclose(lk["b"], lr["b"], rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_precoeff_order2_matches_reference():
    """The headline property: per-node [K, nQ] tables (order-2 test
    space) run through the SAME precoeff kernel."""
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 6, t_disc_num=4, b_disc_num=4,
                          test_order=2)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    assert quad.N.ndim == 2
    params = init_mlp(jax.random.PRNGKey(3), st.n_inputs, (10, 10))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    r_ref = _reference_r(params, quad, st, scale, shift, True, False)
    for g in (1, 2):
        r = pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=True,
            tile=19, interpret=True, q_block=g, precoeff=True,
        )
        np.testing.assert_allclose(r, r_ref, rtol=2e-5, atol=1e-7)

    # gradients too (g=2 exercises the blocked backward)
    def loss_k(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=True,
            tile=19, interpret=True, q_block=2, precoeff=True,
        )
        return jnp.sum((r * quad.mask) ** 2)

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, True, False)
        return jnp.sum((r * quad.mask) ** 2)

    gk, gref = jax.grad(loss_k)(params), jax.grad(loss_ref)(params)
    for lk, lr in zip(gk, gref):
        np.testing.assert_allclose(lk["w"], lr["w"], rtol=5e-4, atol=1e-7)


def test_precoeff_mor_zero_direction():
    """MOR inputs get a zero tangent direction (SURVEY.md §3.5)."""
    case = mor_steady_ad_2d(vels=(0.5, 1.5))
    fd = build_fixed_data(case["pde"], 6, b_disc_num=4)
    st = fd.static
    assert st.n_mor >= 1
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(4), st.n_inputs, (10,))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    r_ref = _reference_r(params, quad, st, scale, shift, False, False)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=False,
        tile=24, interpret=True, precoeff=True,
    )
    np.testing.assert_allclose(r, r_ref, rtol=2e-5, atol=1e-7)


def test_precoeff_prepared_matches_ingraph():
    """prepare_residual_coeffs output threads through `prepared` and
    reproduces the in-graph preparation bit-for-bit; a wrong shape is
    rejected."""
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 6, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(5), st.n_inputs, (10, 10))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    g, tile = 2, 19
    prepared = prepare_residual_coeffs(
        fd.quad, np.asarray(scale), np.asarray(shift),
        time_dependent=True, has_react=False, G=g, tile=tile,
    )
    r_in = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True,
        tile=tile, interpret=True, q_block=g, precoeff=True,
    )
    r_prep = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True,
        tile=tile, interpret=True, q_block=g, precoeff=True,
        prepared=prepared,
    )
    np.testing.assert_allclose(r_prep, r_in, rtol=1e-6, atol=1e-9)

    bad = tuple(a[:, : a.shape[1] // 2] for a in prepared)
    with pytest.raises(ValueError, match="prepared coeff shapes"):
        pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=True,
            tile=tile, interpret=True, q_block=g, precoeff=True,
            prepared=bad,
        )


def test_order2_without_precoeff_rejected():
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 6, t_disc_num=4, b_disc_num=4,
                          test_order=2)
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(6), fd.static.n_inputs, (10,))
    with pytest.raises(ValueError, match="precoeff"):
        pallas_fused_residual(
            params, quad, "tanh", None, None, time_dependent=True,
            tile=19, interpret=True,
        )


@pytest.mark.slow
def test_train_step_precoeff_prepared_matches(tmp_path):
    """shard_map train step with stacked per-shard precoeff layouts
    reproduces the unprepared trajectory — for BOTH test orders (order 2
    shards its per-node tables with the node axis)."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from varnet_tpu.fem.assembly import QuadData, pad_points, pad_quad
    from varnet_tpu.models.mlp import make_input_scaling as mis
    from varnet_tpu.parallel.mesh import (
        DATA_AXIS,
        make_mesh,
        replicate,
        shard_points,
        shard_quad,
    )
    from varnet_tpu.problems.analytic import steady_ad_1d
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import make_train_step

    for order in (1, 2):
        case = steady_ad_1d(kappa=0.2)
        fd = build_fixed_data(case["pde"], 15, test_order=order)
        n_sh = 2
        mesh = make_mesh(n_sh)
        quad_h = pad_quad(fd.quad, n_sh * 7)  # K divisible by shards*tile
        quad = shard_quad(quad_h, mesh)
        bc = shard_points(pad_points(fd.bc, n_sh), mesh)
        tile = quad_h.coords.shape[0] // n_sh
        fused = functools.partial(
            pallas_fused_residual, time_dependent=False, has_react=False,
            tile=tile, interpret=True, q_block=2, precoeff=True,
        )
        loss_fn = make_loss_fn(fd.static, fused_residual=fused,
                               input_scaling=True)
        sc, sh = mis(fd.static.input_lo, fd.static.input_hi)
        ks = quad_h.coords.shape[0] // n_sh
        per_node = quad_h.N.ndim == 2
        parts = []
        for s in range(n_sh):
            sl = slice(s * ks, (s + 1) * ks)

            def tbl(a):
                return a[sl] if per_node else a

            shard = QuadData(
                coords=quad_h.coords[sl], N=tbl(quad_h.N),
                dN=tbl(quad_h.dN), w=tbl(quad_h.w),
                kappa=quad_h.kappa[sl], vel=quad_h.vel[sl],
                src=quad_h.src[sl], react=quad_h.react[sl],
                mask=quad_h.mask[sl],
            )
            parts.append(prepare_residual_coeffs(
                shard, np.asarray(sc), np.asarray(sh),
                time_dependent=False, has_react=False, G=2, tile=tile,
            ))
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        prepared = tuple(
            jax.device_put(np.stack([p[i] for p in parts]), sharding)
            for i in range(len(parts[0]))
        )

        opt = make_optimizer(OptimizerConfig())
        theta0 = replicate(init_mlp(jax.random.PRNGKey(0), 1, (8, 8)), mesh)
        w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

        def run(prep):
            theta = jax.tree_util.tree_map(jnp.copy, theta0)
            opt_state = replicate(opt.init(theta), mesh)
            step = make_train_step(loss_fn, opt, mesh=mesh, donate=False,
                                   tables_per_node=per_node)
            losses = []
            for _ in range(5):
                theta, opt_state, aux = step(theta, opt_state, quad, bc,
                                             None, None, w, prep)
                losses.append(float(aux["loss"]))
            return losses

        with_prep, without = run(prepared), run(None)
        np.testing.assert_allclose(with_prep, without, rtol=1e-6)
        assert with_prep[-1] < with_prep[0], f"order {order} not training"


@pytest.mark.slow
def test_sublane_pad_exact_and_grads():
    """sublane_pad zero-pads hidden widths to 8-multiples (width 20 ->
    24, admitting aligned G=5): values and parameter gradients must be
    EXACTLY those of the unpadded network (padding is zeros and autodiff
    un-pads the grads)."""
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    st = fd.static
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(7), st.n_inputs, (20, 20))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    r_ref = _reference_r(params, quad, st, scale, shift, True, False)
    r = pallas_fused_residual(
        params, quad, "tanh", scale, shift, time_dependent=True,
        tile=49, interpret=True, q_block=5, precoeff=True,
        sublane_pad=True,
    )
    np.testing.assert_allclose(r, r_ref, rtol=2e-5, atol=1e-7)

    def loss_k(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=True,
            tile=49, interpret=True, q_block=5, precoeff=True,
            sublane_pad=True,
        )
        return jnp.sum((r * quad.mask) ** 2)

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, True, False)
        return jnp.sum((r * quad.mask) ** 2)

    gk, gref = jax.grad(loss_k)(params), jax.grad(loss_ref)(params)
    for lk, lr in zip(gk, gref):
        assert lk["w"].shape == lr["w"].shape  # grads un-padded
        np.testing.assert_allclose(lk["w"], lr["w"], rtol=5e-4, atol=1e-7)
        np.testing.assert_allclose(lk["b"], lr["b"], rtol=5e-4, atol=1e-7)


def test_sublane_pad_requires_precoeff():
    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 6, t_disc_num=4, b_disc_num=4)
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    params = init_mlp(jax.random.PRNGKey(8), fd.static.n_inputs, (20,))
    with pytest.raises(ValueError, match="sublane_pad"):
        pallas_fused_residual(
            params, quad, "tanh", None, None, time_dependent=True,
            tile=19, interpret=True, sublane_pad=True,
        )


def test_inconsistent_kernel_knobs_fail_in_ctor():
    """Bad knob combinations must fail at VarNet() construction, not
    minutes later inside the first jitted train step on the device."""
    from varnet_tpu.api import VarNet

    case = transient_ad_2d()
    with pytest.raises(ValueError, match="fused_directional"):
        VarNet(case["pde"], layer_width=(8,), disc_num=4, t_disc_num=3,
               n_devices=1, fused_precoeff=True, fused_directional=False)
    with pytest.raises(ValueError, match="fused_precoeff"):
        VarNet(case["pde"], layer_width=(8,), disc_num=4, t_disc_num=3,
               n_devices=1, fused_sublane_pad=True)


def test_api_gating_order2_autoselects_precoeff():
    """VarNet(test_order=2) hot path: per-node tables AUTO-select the
    precoeff fused-residual kernel (TPU-measured 2.3x the value+jac
    fallback at identical rel-L2, order2_floor.json); combinations the
    precoeff fold cannot express (Fourier embedding, jacobian-panel
    layout, nonlinear advection) keep the value+jac path (hook None).
    Also pins the hook/layout consistency invariant: whenever the hook
    fires, its precoeff keyword equals _precoeff_selected — the single
    predicate _prepare_fused_layout keys on."""
    from varnet_tpu.api import VarNet

    case = transient_ad_2d()
    kw = dict(layer_width=(8, 8), disc_num=6, t_disc_num=3, n_devices=1,
              use_pallas=True)

    vn = VarNet(case["pde"], test_order=2, **kw)
    hook = vn._fused_residual_hook(None)
    assert vn._precoeff_selected is True
    assert hook is not None and hook.keywords["precoeff"] is True

    # order 1 keeps the in-kernel-table directional variant (-3% for
    # precoeff at the flagship shape — BASELINE.md negative result)
    vn1 = VarNet(case["pde"], test_order=1, **kw)
    hook1 = vn1._fused_residual_hook(None)
    assert vn1._precoeff_selected is False
    assert hook1 is not None and hook1.keywords["precoeff"] is False

    # Fourier embedding has no coefficient fold: value+jac path
    vn_ff = VarNet(case["pde"], test_order=2, fourier_features=4, **kw)
    assert vn_ff._precoeff_selected is False
    assert vn_ff._fused_residual_hook(None) is None

    # jacobian-panel layout (fused_directional=False) can't ride precoeff
    vn_jp = VarNet(case["pde"], test_order=2, fused_directional=False,
                   **kw)
    assert vn_jp._precoeff_selected is False
    assert vn_jp._fused_residual_hook(None) is None

    # nonlinear advection needs jacobian panels; the ctor forces
    # fused_directional=False and order 2 falls to value+jac
    from varnet_tpu.problems.analytic import burgers_1d_transient

    bcase = burgers_1d_transient(nu=0.05, a=0.4, c=0.6)
    vn_nl = VarNet(bcase["pde"], layer_width=(8, 8), disc_num=6,
                   t_disc_num=3, n_devices=1, use_pallas=True,
                   test_order=2)
    assert vn_nl._precoeff_selected is False
    assert vn_nl._fused_residual_hook(None) is None


@pytest.mark.slow
def test_batched_train_step_precoeff_per_node_in_graph():
    """batch_num > 1 with the IN-GRAPH precoeff fused kernel and per-node
    (order-2) tables — the path the order-2 auto-selection takes when
    batch_num > 1 blocks the prepared layout (api._train_impl prepares
    only for batch_num == 1).  The scan must slice the [B, Kb, nQ] tables
    per mini-batch and reproduce the XLA loss trajectory exactly."""
    import functools

    from varnet_tpu.fem.assembly import pad_points, pad_quad
    from varnet_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_points,
        shard_quad,
    )
    from varnet_tpu.problems.analytic import steady_ad_1d
    from varnet_tpu.train.loss import make_loss_fn
    from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
    from varnet_tpu.train.trainer import _tree_reshape_batches, make_train_step

    case = steady_ad_1d(kappa=0.2)
    fd = build_fixed_data(case["pde"], 15, test_order=2)
    n_sh, batch = 2, 2
    mesh = make_mesh(n_sh)
    quad_h = pad_quad(fd.quad, n_sh * batch)
    assert quad_h.N.ndim == 2  # per-node tables
    quad_b = _tree_reshape_batches(quad_h, batch)
    quad_d = shard_quad(quad_b, mesh, batched=True)
    bc = shard_points(pad_points(fd.bc, n_sh), mesh)

    kb = quad_h.coords.shape[0] // batch // n_sh  # rows per shard per batch
    fused = functools.partial(
        pallas_fused_residual, time_dependent=False, has_react=False,
        tile=kb, interpret=True, q_block=2, precoeff=True,
    )
    opt = make_optimizer(OptimizerConfig())
    theta0 = replicate(init_mlp(jax.random.PRNGKey(0), 1, (8, 8)), mesh)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

    def run(loss_fn):
        theta = jax.tree_util.tree_map(jnp.copy, theta0)
        opt_state = replicate(opt.init(theta), mesh)
        step = make_train_step(loss_fn, opt, mesh=mesh, donate=False,
                               batch_num=batch, tables_per_node=True)
        losses = []
        for _ in range(5):
            theta, opt_state, aux = step(theta, opt_state, quad_d, bc,
                                         None, None, w)
            losses.append(float(aux["loss"]))
        return losses

    l_fused = run(make_loss_fn(fd.static, fused_residual=fused,
                               input_scaling=True))
    l_xla = run(make_loss_fn(fd.static, input_scaling=True))
    np.testing.assert_allclose(l_fused, l_xla, rtol=2e-5)
    assert l_fused[-1] < l_fused[0]


@pytest.mark.slow
def test_precoeff_mor_order2_combo():
    """MOR (parametric mu inputs) x order-2 per-node tables through the
    precoeff kernel — the combination the order-2 auto-selection newly
    reaches (api._precoeff_selected makes no n_mor exclusion).  Values
    AND parameter gradients vs the compositional reference."""
    case = mor_steady_ad_2d(vels=(0.5, 1.5))
    fd = build_fixed_data(case["pde"], 6, b_disc_num=4, test_order=2)
    st = fd.static
    assert st.n_mor >= 1
    quad = jax.tree_util.tree_map(jnp.asarray, fd.quad)
    assert quad.N.ndim == 2  # per-node tables paired with the mu grid
    params = init_mlp(jax.random.PRNGKey(7), st.n_inputs, (10, 10))
    scale, shift = make_input_scaling(st.input_lo, st.input_hi)
    r_ref = _reference_r(params, quad, st, scale, shift, False, False)
    tile = quad.coords.shape[0]
    for g in (1, 2):
        r = pallas_fused_residual(
            params, quad, "tanh", scale, shift, time_dependent=False,
            tile=tile, interpret=True, q_block=g, precoeff=True,
        )
        np.testing.assert_allclose(r, r_ref, rtol=2e-5, atol=1e-7)

    def loss_k(p):
        r = pallas_fused_residual(
            p, quad, "tanh", scale, shift, time_dependent=False,
            tile=tile, interpret=True, q_block=2, precoeff=True,
        )
        return jnp.sum((r * quad.mask) ** 2)

    def loss_ref(p):
        r = _reference_r(p, quad, st, scale, shift, False, False)
        return jnp.sum((r * quad.mask) ** 2)

    gk, gref = jax.grad(loss_k)(params), jax.grad(loss_ref)(params)
    for lk, lr in zip(gk, gref):
        np.testing.assert_allclose(lk["w"], lr["w"], rtol=5e-4, atol=1e-7)
        np.testing.assert_allclose(lk["b"], lr["b"], rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_train_order2_auto_fused_matches_xla():
    """END-TO-END VarNet.train with the order-2 AUTO-selected precoeff
    kernel (interpret-wrapped hook, the test_ensemble forcing pattern)
    vs the XLA path: same seed, same loss trajectory.  Covers the full
    _train_impl wiring — gating, per-node sharding, loss assembly — not
    just the kernel/trainer pieces."""
    import functools

    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_2d

    case = steady_ad_2d(kappa=0.1)

    def run(fused: bool):
        vn = VarNet(case["pde"], layer_width=(10, 10), disc_num=8,
                    n_devices=2, test_order=2, seed=11, use_pallas=fused)
        if fused:
            hook = vn._fused_residual_hook(None)
            assert hook is not None and hook.keywords["precoeff"] is True
            vn._fused_residual_hook = lambda prec: functools.partial(
                hook, interpret=True
            )
            # prepared layout resolves G/tile for the COMPILED kernel;
            # skip it so the interpret kernel prepares in-graph
            vn._prepare_fused_layout = lambda *a, **kw: None
        r = vn.train(epoch_num=30, weight=(1.0, 10.0), save_freq=15,
                     verbose=False)
        return [rec["loss"] for rec in r.losses]

    np.testing.assert_allclose(run(True), run(False), rtol=5e-4)
