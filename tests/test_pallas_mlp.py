"""Fused Pallas forward+jacobian kernel vs the autodiff reference.

Runs in Pallas interpreter mode on the CPU test backend (SURVEY.md §7
"hard parts" item 1: "the jvp/vmap path is the correct-by-construction
fallback" — these tests pin the kernel to it, values AND parameter
gradients).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.models.mlp import (
    init_mlp,
    make_input_scaling,
    mlp_value_and_jac,
    mlp_value_and_jac_auto,
)
from varnet_tpu.ops.pallas_mlp import pallas_value_and_jac

pvj = functools.partial(pallas_value_and_jac, tile=128, interpret=True)


@pytest.mark.parametrize("n_in,hidden", [(1, (8,)), (2, (16, 16)), (3, (8, 8, 8))])
@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "sin"])
def test_forward_matches_auto(n_in, hidden, activation):
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, n_in, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (200, n_in))
    u_ref, du_ref = mlp_value_and_jac_auto(params, x, activation)
    u, du = pvj(params, x, activation)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


def test_forward_with_scaling():
    params = init_mlp(jax.random.PRNGKey(0), 3, (16, 16))
    lo = np.array([0.0, -1.0, 2.0])
    hi = np.array([2.0, 3.0, 7.0])
    scale, shift = make_input_scaling(lo, hi)
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (150, 3), minval=lo.min(), maxval=hi.max()
    )
    u_ref, du_ref = mlp_value_and_jac(params, x, "tanh", scale, shift)
    u, du = pvj(params, x, "tanh", scale, shift)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


def test_padding_odd_point_count():
    params = init_mlp(jax.random.PRNGKey(0), 2, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (77, 2))  # not a tile multiple
    u_ref, du_ref = mlp_value_and_jac(params, x, "tanh")
    u, du = pvj(params, x, "tanh")
    assert u.shape == (77,) and du.shape == (77, 2)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "sin"])
@pytest.mark.slow
def test_param_grads_match_auto(activation):
    """The custom-VJP backward kernel must reproduce autodiff parameter
    gradients of a loss that touches BOTH u and du (like the weak form)."""
    n_in = 3
    params = init_mlp(jax.random.PRNGKey(0), n_in, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (256, n_in))
    cu = jax.random.normal(jax.random.PRNGKey(2), (256,))
    cd = jax.random.normal(jax.random.PRNGKey(3), (256, n_in))

    def loss(vj_fn, params):
        u, du = vj_fn(params, x, activation)
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(u * u)

    g_ref = jax.grad(functools.partial(loss, mlp_value_and_jac))(params)
    g = jax.grad(functools.partial(loss, pvj))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_ff_kernel_matches_jnp_path():
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import pallas_ff_value_and_jac

    n_in, n_feat = 3, 8
    b = make_fourier_features(jax.random.PRNGKey(0), n_in, n_feat, scale=1.3)
    params = init_mlp(jax.random.PRNGKey(1), 2 * n_feat, (16, 16))
    scale, shift = make_input_scaling(np.zeros(n_in), 2 * np.ones(n_in))
    x = jax.random.uniform(jax.random.PRNGKey(2), (150, n_in), maxval=2.0)
    u_ref, du_ref = ff_value_and_jac(b, params, x, "tanh", scale, shift)
    u, du = pallas_ff_value_and_jac(b, params, x, "tanh", scale, shift,
                                    tile=128, interpret=True)
    np.testing.assert_allclose(u, u_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(du, du_ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_ff_kernel_param_grads():
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import pallas_ff_value_and_jac

    n_in, n_feat = 2, 4
    b = make_fourier_features(jax.random.PRNGKey(0), n_in, n_feat)
    params = init_mlp(jax.random.PRNGKey(1), 2 * n_feat, (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(2), (256, n_in))
    cu = jax.random.normal(jax.random.PRNGKey(3), (256,))
    cd = jax.random.normal(jax.random.PRNGKey(4), (256, n_in))

    def loss(vj, params):
        u, du = vj(b, params, x, "tanh")
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(u * u)

    g_ref = jax.grad(functools.partial(loss, ff_value_and_jac))(params)
    pvj_ff = functools.partial(pallas_ff_value_and_jac, tile=128, interpret=True)
    g = jax.grad(functools.partial(loss, pvj_ff))(params)
    for a, b2 in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b2, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("activation", ["tanh", "sigmoid", "sin"])
@pytest.mark.slow
def test_jvp_kernel_matches_auto(activation):
    """The custom-JVP twin (Levenberg-Marquardt's J v path) must reproduce
    jax.jvp of the stock matmul-chain path w.r.t. params."""
    from varnet_tpu.ops.pallas_mlp import pallas_value_and_jac_jvp

    n_in = 3
    params = init_mlp(jax.random.PRNGKey(0), n_in, (8, 8))
    tangent = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape), params
    )
    scale, shift = make_input_scaling(np.zeros(n_in), 2 * np.ones(n_in))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, n_in), maxval=2.0)
    pvj_jvp = functools.partial(pallas_value_and_jac_jvp, tile=128, interpret=True)

    def f(vj_fn, p):
        u, du = vj_fn(p, x, activation, scale, shift)
        # touch both outputs nonlinearly so primal-out errors would show too
        return jnp.concatenate([u[None, :] ** 2, du.T * u[None, :]])

    out_ref, dout_ref = jax.jvp(
        functools.partial(f, mlp_value_and_jac), (params,), (tangent,)
    )
    out, dout = jax.jvp(functools.partial(f, pvj_jvp), (params,), (tangent,))
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(dout, dout_ref, rtol=5e-4, atol=5e-5)


def test_jvp_tiler_caps_measured_oom_shapes():
    """Regression pin for the round-3 scoped-VMEM OOM: Mosaic measured
    23.76 MB at (h=64, n_in=3, tile=1536) — 60.4 units of h*T*4 bytes —
    against the 16 MB limit.  _auto_tile_jvp must keep its calibrated
    2x-overhead estimate (66 units at n_in=3) under the 12 MB budget
    for the shapes that failed AND the flagship shape that sat within
    ~5% of the limit under the old shared formula."""
    from varnet_tpu.ops.pallas_mlp import _auto_tile_jvp

    measured_units = 60.4  # Mosaic's actual appetite at n_in=3
    for h in (64, 48, 96):
        tile = _auto_tile_jvp(4096, h, 3)
        assert tile % 256 == 0 and tile >= 256
        scoped = measured_units * h * tile * 4
        assert scoped < 16 * 1024 * 1024, (h, tile, scoped)
    # the exact shapes: 3-D width-64 LM (OOM'd) and the flagship
    assert _auto_tile_jvp(4096, 64, 3) <= 768
    assert _auto_tile_jvp(4096, 48, 3) <= 1024
    # requested tile is still honored when smaller
    assert _auto_tile_jvp(256, 64, 3) == 256


def test_lm_tiler_caps_wide_nets_only():
    """Regression pin for the second round-3 scoped-VMEM OOM (queue3
    ad3d_d16_deep): the custom-VJP backward under the LM CG while-loop
    measured 19.33 MB at (h=64, n_in=3, n_layers=4, tile=1280) — ~2.1x
    the static live-set estimate.  _auto_tile_lm must cap that shape
    under the limit, while LEAVING the TPU-proven narrow LM recipes
    (h=20 tile 5120, h=48 tile 1536 — both measured good) untouched."""
    from varnet_tpu.ops.pallas_mlp import _auto_tile_lm

    # the failing shape: measured 19.33 MB at tile 1280 -> 15.1 KB/col
    tile = _auto_tile_lm(4096, 64, 4, 3)
    assert tile % 256 == 0 and tile >= 256
    scoped = (19.33 * 1024 * 1024 / 1280) * tile
    assert scoped < 16 * 1024 * 1024, (tile, scoped)
    # proven narrow recipes keep their measured tiles (cap must not bind)
    assert _auto_tile_lm(5120, 20, 3, 3) == 5120
    assert _auto_tile_lm(1536, 48, 4, 3) == 1536
    # requested tile still honored when smaller
    assert _auto_tile_lm(256, 64, 4, 3) == 256


def test_vjp_tiler_caps_wide_highdim_shapes_only():
    """Regression pin for the fourth round-3 scoped-VMEM OOM (queue15
    hardbc_3dt): the value+jac custom-VJP backward under the plain Adam
    step measured 16.02 MB at (h=64, n_in=4, n_layers=3, tile=1280) —
    1.78x the 9 MB static estimate, 17 KB over the limit (3-Dt hard BC
    declines the fused-residual kernel, so value+jac carries training).
    The _vjp_budget clamp must cap that shape under the limit while
    leaving every n_in<=3 shape (incl. the same-night clean h=64
    3-D steady run) and narrow nets untouched."""
    from varnet_tpu.ops.pallas_mlp import _auto_tile, _vjp_budget

    # the failing shape: measured 16.02 MB at tile 1280 -> 12.8 KB/col
    tile = _auto_tile(4096, 64, 3, 4, budget_bytes=_vjp_budget(64, 4))
    assert tile % 256 == 0 and tile >= 256
    scoped = (16.02 * 1024 * 1024 / 1280) * tile
    assert scoped < 15 * 1024 * 1024, (tile, scoped)
    # n_in=3 at the same width ran clean — the clamp must not bind there,
    # nor for narrow nets at n_in=4
    assert _vjp_budget(64, 3) is None
    assert _vjp_budget(48, 4) is None
    assert _vjp_budget(96, 4) == 7 * 1024 * 1024


@pytest.mark.slow
def test_lm_rides_jvp_kernel_pair():
    """End-to-end: make_lm_step with the (VJP, JVP) kernel-closure pair
    reduces the loss exactly like the XLA-only pair on a tiny problem."""
    from varnet_tpu.ops.pallas_mlp import pallas_value_and_jac_jvp
    from varnet_tpu.train.gauss_newton import LMState, make_lm_step

    params = init_mlp(jax.random.PRNGKey(0), 2, (8, 8))
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    target = jnp.sin(x[:, 0]) * x[:, 1]

    def make_closure(vj_fn):
        def closure(flat):
            u, du = vj_fn(unravel(flat), x, "tanh")
            return jnp.concatenate([u - target, 0.1 * du[:, 0]])

        return closure

    c_vjp = make_closure(functools.partial(pallas_value_and_jac, tile=128,
                                           interpret=True))
    c_jvp = make_closure(functools.partial(pallas_value_and_jac_jvp, tile=128,
                                           interpret=True))
    c_xla = make_closure(mlp_value_and_jac)

    def run(step_fn, closure):
        r0 = closure(flat0)
        st = LMState(flat=flat0, lam=jnp.asarray(1e-2), loss=jnp.dot(r0, r0))
        for _ in range(3):
            st = step_fn(st)
        return float(st.loss)

    loss_kernel = run(
        make_lm_step(c_vjp, cg_iters=20, residual_jvp=c_jvp), c_vjp
    )
    loss_xla = run(make_lm_step(c_xla, cg_iters=20), c_xla)
    assert loss_kernel < 0.9 * float(jnp.dot(c_xla(flat0), c_xla(flat0)))
    np.testing.assert_allclose(loss_kernel, loss_xla, rtol=1e-3)


@pytest.mark.slow
def test_param_grads_with_scaling_multitile():
    n_in = 2
    params = init_mlp(jax.random.PRNGKey(0), n_in, (16, 16))
    scale, shift = make_input_scaling(np.zeros(2), 2 * np.ones(2))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, n_in), maxval=2.0)

    def loss(vj_fn, params):
        u, du = vj_fn(params, x, "tanh", scale, shift)
        return jnp.sum((u - 1.0) ** 2) + jnp.sum(du * du)

    g_ref = jax.grad(functools.partial(loss, mlp_value_and_jac))(params)
    g = jax.grad(functools.partial(loss, pvj))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_ff_jvp_kernel_matches_auto():
    """The Fourier custom-JVP twin (LM's J v path for FF trial nets) must
    reproduce jax.jvp of the XLA ff_value_and_jac path w.r.t. params."""
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import pallas_ff_value_and_jac_jvp

    n_in, n_feat = 3, 8
    b = make_fourier_features(jax.random.PRNGKey(4), n_in, n_feat, scale=0.8)
    params = init_mlp(jax.random.PRNGKey(0), 2 * n_feat, (8, 8))
    tangent = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(7), a.shape), params
    )
    scale, shift = make_input_scaling(np.zeros(n_in), 2 * np.ones(n_in))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, n_in), maxval=2.0)
    kernel_fn = functools.partial(pallas_ff_value_and_jac_jvp, b, tile=128,
                                  interpret=True)
    ref_fn = functools.partial(ff_value_and_jac, b)

    def f(vj_fn, p):
        u, du = vj_fn(p, x, "tanh", scale, shift)
        return jnp.concatenate([u[None, :] ** 2, du.T * u[None, :]])

    out_ref, dout_ref = jax.jvp(
        functools.partial(f, ref_fn), (params,), (tangent,)
    )
    out, dout = jax.jvp(functools.partial(f, kernel_fn), (params,), (tangent,))
    # FF paths carry trig-evaluation noise on top of the matmul chain
    # (cf. test_ff_kernel_matches_jnp_path's looser du tolerance)
    np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(dout, dout_ref, rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_lm_rides_ff_jvp_kernel_pair():
    """make_lm_step with the Fourier (VJP, JVP) kernel-closure pair matches
    the XLA-only FF pair on a tiny least-squares problem."""
    from varnet_tpu.models.mlp import ff_value_and_jac, make_fourier_features
    from varnet_tpu.ops.pallas_mlp import (
        pallas_ff_value_and_jac,
        pallas_ff_value_and_jac_jvp,
    )
    from varnet_tpu.train.gauss_newton import LMState, make_lm_step

    b = make_fourier_features(jax.random.PRNGKey(4), 2, 6, scale=0.5)
    params = init_mlp(jax.random.PRNGKey(0), 12, (8, 8))
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    target = jnp.sin(x[:, 0]) * x[:, 1]

    def make_closure(vj_fn):
        def closure(flat):
            u, du = vj_fn(unravel(flat), x, "tanh")
            return jnp.concatenate([u - target, 0.1 * du[:, 0]])

        return closure

    c_vjp = make_closure(functools.partial(pallas_ff_value_and_jac, b,
                                           tile=128, interpret=True))
    c_jvp = make_closure(functools.partial(pallas_ff_value_and_jac_jvp, b,
                                           tile=128, interpret=True))
    c_xla = make_closure(functools.partial(ff_value_and_jac, b))

    def run(step_fn, closure):
        r0 = closure(flat0)
        st = LMState(flat=flat0, lam=jnp.asarray(1e-2), loss=jnp.dot(r0, r0))
        for _ in range(3):
            st = step_fn(st)
        return float(st.loss)

    loss_kernel = run(
        make_lm_step(c_vjp, cg_iters=20, residual_jvp=c_jvp), c_vjp
    )
    loss_xla = run(make_lm_step(c_xla, cg_iters=20), c_xla)
    assert loss_kernel < 0.9 * float(jnp.dot(c_xla(flat0), c_xla(flat0)))
    # 3 LM iterations amplify f32 trig-evaluation noise through the
    # accept/reject damping logic -- 2% is trajectory agreement, not
    # per-product precision (pinned by test_ff_jvp_kernel_matches_auto)
    np.testing.assert_allclose(loss_kernel, loss_xla, rtol=2e-2)
