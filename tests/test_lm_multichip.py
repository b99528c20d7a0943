"""Multi-chip verification of the LM/L-BFGS refiners (VERDICT r2 next #4).

The Adam step's collective structure is pinned by
test_single_collective.py; the refiners run under auto-sharded jit and
were previously untested on the 8-virtual-device mesh.  Two invariants:

  * sharded-vs-single-device agreement: the LM trajectory (loss after a
    few iterations) must match a 1-device run to float tolerance;
  * bounded collective count: the compiled LM step must contain a SMALL
    static number of all-reduces (one per CG application lives inside the
    fori_loop body and is counted once) — a regression to per-leaf
    reductions would multiply launch latency on ICI and deadlock
    constrained CPU runtimes (CLAUDE.md trap).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import steady_ad_1d, transient_ad_2d


def _lm_losses(n_devices, steps=3):
    case = steady_ad_1d(kappa=0.2)
    vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=24,
                n_devices=n_devices)
    vn.train(epoch_num=60, weight=(1.0, 10.0), save_freq=60, verbose=False)
    r = vn.refine_lm(steps=steps, weight=(1.0, 10.0), cg_iters=10,
                     save_freq=1, verbose=False, error_disc=16)
    return [rec["loss"] for rec in r.losses], vn


@pytest.mark.slow
def test_lm_sharded_matches_single_device():
    """refine_lm on the 8-device mesh reproduces the 1-device trajectory
    (same seed, same data; only the reduction order differs)."""
    losses_8, _ = _lm_losses(8)
    losses_1, _ = _lm_losses(1)
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)


def _make_sharded_lm_parts(cg_iters=5, cg_segment=0):
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P

    from varnet_tpu.fem.assembly import (
        QuadData, build_fixed_data, pad_points, pad_quad,
    )
    from varnet_tpu.models.mlp import init_mlp
    from varnet_tpu.parallel.mesh import (
        DATA_AXIS, make_mesh, replicate, shard_points, shard_quad,
    )
    from varnet_tpu.train.gauss_newton import (
        LMState, make_lm_step, make_residual_fn,
    )

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
    step = make_lm_step(closure, cg_iters=cg_iters, cg_segment=cg_segment,
                        mesh=mesh, data=data, data_specs=specs)
    state = LMState(flat=flat0, lam=jnp.asarray(1e-3), loss=jnp.asarray(1.0))
    return step, state, data


def _count_all_reduces(hlo):
    return len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )


@pytest.mark.slow
def test_lm_step_collective_count_pinned():
    """The compiled sharded LM step has EXACTLY 3 all-reduce ops: the
    packed init (b ++ loss), the one inside the CG while-body, and the
    accept-candidate loss.  A regression to per-leaf reductions (which
    deadlock constrained CPU runtimes and multiply ICI launch latency) or
    to GSPMD auto-partitioning (which replicates the whole computation —
    zero collectives, n-fold redundant work) turns this red."""
    step, state, data = _make_sharded_lm_parts(cg_iters=5)
    out = step(state)
    assert jnp.isfinite(out.loss)
    hlo = step.jitted.lower(state, data).compile().as_text()
    total = _count_all_reduces(hlo)
    assert total == 3, f"expected exactly 3 all-reduces, got {total}"


@pytest.mark.slow
def test_lbfgs_sharded_matches_single_device():
    """refine_lbfgs on the 8-device mesh reproduces the 1-device result."""
    def run(n_devices):
        case = steady_ad_1d(kappa=0.2)
        vn = VarNet(case["pde"], layer_width=(12, 12), disc_num=24,
                    n_devices=n_devices)
        vn.train(epoch_num=60, weight=(1.0, 10.0), save_freq=60, verbose=False)
        r = vn.refine_lbfgs(steps=10, weight=(1.0, 10.0), save_freq=5,
                            verbose=False, error_disc=16)
        return [rec["loss"] for rec in r.losses]

    np.testing.assert_allclose(run(8), run(1), rtol=2e-4)
