"""Jacobi-preconditioned CG for the LM refiner (train/gauss_newton.py).

Invariants:

  * the Hutchinson probe estimator is an unbiased diag(J^T J): on a
    linear residual r = A x - b it converges to diag(A^T A);
  * on a badly diagonally-scaled least-squares problem, preconditioned
    CG at a tiny iteration budget reaches the damped-GN optimum that
    plain CG at the same budget cannot;
  * segmented and fused CG agree under preconditioning;
  * the sharded LM step with precond keeps the EXACT 3-all-reduce
    census (the diag probes ride the packed init psum), and at a
    generous CG budget lands at the same accepted loss as plain CG
    (same damped-GN system, both solved).
"""

import pytest

import re

import jax
import jax.numpy as jnp
import numpy as np

from varnet_tpu.train.gauss_newton import LMState, make_lm_step


def _linear_problem(scales):
    """r(x) = A x - b with controlled, widely-spread diagonal scales."""
    rng = np.random.default_rng(0)
    n = len(scales)
    q = np.linalg.qr(rng.standard_normal((n, n)))[0].astype(np.float32)
    a = np.diag(np.asarray(scales, np.float32)) + 0.05 * (
        (q * np.asarray(scales, np.float32)) @ q.T
    )
    b = rng.standard_normal(n).astype(np.float32)
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)
    return a_j, b_j, (lambda x: a_j @ x - b_j)


def test_diag_probe_estimator_unbiased():
    from varnet_tpu.train.gauss_newton import _diag_probe_est

    a, _, res = _linear_problem([1.0, 10.0, 100.0, 0.5, 3.0, 40.0])
    _, pullback = jax.vjp(res, jnp.zeros(6))
    est = _diag_probe_est(pullback, 6, 4000, jnp.float32,
                          jax.random.PRNGKey(3))
    true = jnp.diag(a.T @ a)
    np.testing.assert_allclose(est, true, rtol=0.12)


def test_precond_cg_beats_plain_at_small_budget():
    # curvature scales spanning 4 decades (cond(A^T A) ~ 2e6; Jacobi
    # scaling leaves ~1.5e3): at 12 iterations PCG solves the 8-dim
    # system to ~3e-11 while plain CG is still at ~2.5e-1 (measured).
    scales = [1.0, 1.0, 30.0, 30.0, 1e3, 1e3, 3e4, 3e4]
    _, _, res = _linear_problem(scales)
    x0 = jnp.zeros(8)
    state0 = LMState(flat=x0, lam=jnp.asarray(1e-8),
                     loss=jnp.dot(res(x0), res(x0)))

    def final_loss(precond):
        step = make_lm_step(res, cg_iters=12, precond=precond)
        return float(step(state0).loss)

    plain, pre = final_loss(0), final_loss(32)
    assert pre < 1e-6, f"preconditioned CG did not solve: {pre}"
    assert pre < plain * 1e-2, f"no speedup: plain {plain}, precond {pre}"


def test_precond_segmented_matches_fused():
    scales = [1.0, 5.0, 200.0, 1e3]
    _, _, res = _linear_problem(scales)
    x0 = jnp.ones(4)
    state0 = LMState(flat=x0, lam=jnp.asarray(1e-6),
                     loss=jnp.dot(res(x0), res(x0)))
    fused = make_lm_step(res, cg_iters=8, precond=16)(state0)
    seg = make_lm_step(res, cg_iters=8, precond=16, cg_segment=4)(state0)
    np.testing.assert_allclose(seg.loss, fused.loss, rtol=1e-5)
    np.testing.assert_allclose(seg.flat, fused.flat, rtol=1e-4, atol=1e-6)


def test_leaf_reduce_diag_exact():
    from varnet_tpu.train.gauss_newton import _leaf_reduce_diag

    diag = jnp.asarray([1.0, 3.0, 10.0, 20.0, 30.0, 100.0])
    segs = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
    out = np.asarray(_leaf_reduce_diag(diag, segs, 3))
    np.testing.assert_allclose(out, [2.0, 2.0, 20.0, 20.0, 20.0, 100.0])


def test_leaf_precond_beats_plain_on_blockwise_scales():
    """Per-leaf trace preconditioning fixes BLOCK-constant curvature
    disparity (the cross-layer case it exists for) as well as the
    elementwise estimate does — without its per-element probe noise
    (VERDICT r3 item 9: the noise was measured to degrade final rel-L2
    on the real LM, lm_precond_tpu.json)."""
    scales = [1.0, 1.0, 1.0, 1.0, 3e3, 3e3, 3e3, 3e3]
    _, _, res = _linear_problem(scales)
    segs = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    x0 = jnp.zeros(8)
    state0 = LMState(flat=x0, lam=jnp.asarray(1e-8),
                     loss=jnp.dot(res(x0), res(x0)))
    plain = float(make_lm_step(res, cg_iters=10)(state0).loss)
    leaf = float(make_lm_step(res, cg_iters=10, precond=32,
                              leaf_segments=segs,
                              precond_mode="leaf")(state0).loss)
    assert leaf < 1e-6, f"leaf-preconditioned CG did not solve: {leaf}"
    assert leaf < plain * 1e-2, f"no speedup: plain {plain}, leaf {leaf}"


def test_leaf_mode_requires_segments():
    import pytest

    _, _, res = _linear_problem([1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError):
        make_lm_step(res, cg_iters=4, precond=8, precond_mode="leaf")


@pytest.mark.slow
def test_refine_lm_leaf_precond_end_to_end():
    """The api default (precond_mode='leaf') builds leaf_segments from
    theta and descends on a real problem."""
    from varnet_tpu.api import VarNet
    from varnet_tpu.problems.analytic import steady_ad_1d

    case = steady_ad_1d()
    vn = VarNet(case["pde"], layer_width=(10,), disc_num=12, n_devices=1)
    vn.train(epoch_num=300, weight=(1.0, 10.0), verbose=False)
    r = vn.refine_lm(steps=4, weight=(1.0, 10.0), cg_iters=15,
                     save_freq=4, verbose=False, precond=8)
    losses = [rec["loss"] for rec in r.losses]
    assert np.isfinite(losses[-1])


def _count_all_reduces(hlo):
    return len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )


def _make_sharded_lm_parts(cg_iters=5, precond=0, cg_segment=0,
                           precond_mode="diag"):
    """tests.test_lm_multichip's harness, with the precond knob."""
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P

    from varnet_tpu.fem.assembly import (
        QuadData, build_fixed_data, pad_points, pad_quad,
    )
    from varnet_tpu.models.mlp import init_mlp
    from varnet_tpu.parallel.mesh import (
        DATA_AXIS, make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.problems.analytic import transient_ad_2d
    from varnet_tpu.train.gauss_newton import make_residual_fn

    case = transient_ad_2d()
    fd = build_fixed_data(case["pde"], 8, t_disc_num=4, b_disc_num=4)
    mesh = make_mesh(8)
    quad = shard_quad(pad_quad(fd.quad, 8), mesh)
    bc = shard_points(pad_points(fd.bc, 8), mesh)
    ic = shard_points(pad_points(fd.ic, 8), mesh)
    res_fn = make_residual_fn(fd.static)
    theta = replicate(
        init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (12, 12)), mesh
    )
    flat0, unravel = ravel_pytree(theta)
    w = jnp.asarray([1.0, 10.0, 10.0, 0.0])

    def closure(flat, data):
        q, b, i, o = data
        return res_fn(unravel(flat), q, b, i, o, w)

    rep, per_node = P(), P(DATA_AXIS)
    quad_spec = QuadData(coords=per_node, N=rep, dN=rep, w=rep,
                         kappa=per_node, vel=per_node, src=per_node,
                         react=per_node, mask=per_node)
    data = (quad, bc, ic, None)
    specs = (quad_spec, per_node, per_node, per_node)
    leaf_sizes = [int(np.size(leaf))
                  for leaf in jax.tree_util.tree_leaves(theta)]
    segs = np.repeat(np.arange(len(leaf_sizes)), leaf_sizes)
    step = make_lm_step(closure, cg_iters=cg_iters, cg_segment=cg_segment,
                        mesh=mesh, data=data, data_specs=specs,
                        precond=precond, leaf_segments=segs,
                        precond_mode=precond_mode)
    state = LMState(flat=flat0, lam=jnp.asarray(1e-3), loss=jnp.asarray(1.0))
    return step, state, data


@pytest.mark.slow
def test_precond_sharded_census_pinned():
    """precond probes ride the packed init psum: still exactly 3
    all-reduces per LM step."""
    step, state, data = _make_sharded_lm_parts(cg_iters=5, precond=8)
    out = step(state)
    assert jnp.isfinite(out.loss)
    hlo = step.jitted.lower(state, data).compile().as_text()
    total = _count_all_reduces(hlo)
    assert total == 3, f"expected exactly 3 all-reduces, got {total}"


@pytest.mark.slow
def test_leaf_precond_sharded_census_and_descent():
    """Leaf mode on the sharded path: the segment reduction happens
    AFTER the packed init psum, so the 3-all-reduce census is unchanged,
    and the step descends."""
    step, state, data = _make_sharded_lm_parts(cg_iters=20, precond=8,
                                               precond_mode="leaf")
    hlo = step.jitted.lower(state, data).compile().as_text()
    assert _count_all_reduces(hlo) == 3
    out = state
    for _ in range(3):
        out = step(out)
    assert jnp.isfinite(out.loss)
    assert float(out.loss) < 7.0, f"no descent: {float(out.loss)}"


@pytest.mark.slow
def test_precond_sharded_descends():
    """The preconditioned sharded LM makes progress on a real problem.
    (No equal-budget comparison against plain CG here: far from the
    optimum, LM accept/reject dynamics dominate — a more exactly solved
    damped system can overshoot nonlinearly and be rejected.  The
    near-convergence win is measured, not pinned:
    benchmarks/lm_precond_probe.py.)"""
    step, state, _ = _make_sharded_lm_parts(cg_iters=20, precond=8)
    out = state
    for _ in range(3):
        out = step(out)
    # starting loss is ~9.8 (measured); 3 iterations must land clearly
    # below it (accept/reject may burn one iteration raising lam).
    assert jnp.isfinite(out.loss)
    assert float(out.loss) < 7.0, f"no descent: {float(out.loss)}"


@pytest.mark.slow
def test_segmented_sharded_both_variants_descend():
    """The segmented sharded path (the production flagship LM recipe
    uses cg_segment=40) runs and descends with and without precond —
    regression for the cg_init signature now threading lam/minv."""
    for p in (0, 8):
        step, state, _ = _make_sharded_lm_parts(cg_iters=10, precond=p,
                                                cg_segment=4)
        out = step(step(state))
        assert jnp.isfinite(out.loss)
        assert float(out.loss) < 9.0, f"precond={p}: {float(out.loss)}"


def test_segmented_exact_iteration_count():
    """cg_iters NOT divisible by cg_segment runs exactly cg_iters
    iterations — segmented and fused results agree.  Regression: the
    old ceil-division over-ran by up to seg-1 CG iterations, so a
    non-divisible budget silently solved a different system."""
    scales = [1.0, 5.0, 200.0, 1e3]
    _, _, res = _linear_problem(scales)
    x0 = jnp.ones(4)
    state0 = LMState(flat=x0, lam=jnp.asarray(1e-6),
                     loss=jnp.dot(res(x0), res(x0)))
    fused = make_lm_step(res, cg_iters=7)(state0)
    seg = make_lm_step(res, cg_iters=7, cg_segment=4)(state0)
    np.testing.assert_allclose(seg.loss, fused.loss, rtol=1e-5)
    np.testing.assert_allclose(seg.flat, fused.flat, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_segmented_sharded_exact_iteration_count():
    """Same non-divisible-budget exactness on the sharded LM path (its
    remainder segment is a separately-compiled shard_map)."""
    step_f, state, _ = _make_sharded_lm_parts(cg_iters=7)
    step_s, _, _ = _make_sharded_lm_parts(cg_iters=7, cg_segment=4)
    out_f, out_s = step_f(state), step_s(state)
    np.testing.assert_allclose(out_s.loss, out_f.loss, rtol=1e-5)
    np.testing.assert_allclose(out_s.flat, out_f.flat, rtol=1e-4, atol=1e-6)
