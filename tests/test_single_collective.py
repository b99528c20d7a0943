"""Design invariant: the compiled train step contains exactly ONE
all-reduce (the packed grads+aux psum — DESIGN.md decision 3).

A regression here means gradient leaves are being reduced one-by-one
again, which deadlocks constrained CPU runtimes and multiplies collective
launch latency on ICI.
"""

import jax
import jax.numpy as jnp

from varnet_tpu.fem.assembly import build_fixed_data, pad_points, pad_quad
from varnet_tpu.models.mlp import init_mlp
from varnet_tpu.parallel.mesh import make_mesh, replicate, shard_points, shard_quad
from varnet_tpu.problems.analytic import steady_ad_1d
from varnet_tpu.train.loss import make_loss_fn
from varnet_tpu.train.optim import OptimizerConfig, make_optimizer
from varnet_tpu.train.trainer import make_train_step


def test_step_has_exactly_one_all_reduce():
    case = steady_ad_1d()
    fd = build_fixed_data(case["pde"], 24, pad_multiple=8)
    mesh = make_mesh(8)
    quad = shard_quad(pad_quad(fd.quad, 8), mesh)
    bc = shard_points(pad_points(fd.bc, 8), mesh)
    loss_fn = make_loss_fn(fd.static)
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(
        init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (16, 16)), mesh
    )
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

    compiled = step.jitted.lower(
        theta, opt_state, quad, bc, None, None, w, None, None, None
    ).compile()
    hlo = compiled.as_text()
    # Count distinct all-reduce ops (async start/done pairs count once).
    import re

    total = len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )
    assert total == 1, f"expected exactly 1 all-reduce, found {total}"


def test_step_with_flux_rows_still_one_all_reduce():
    """Neumann flux rows add a penalty term and an aux scalar; both must
    ride the SAME packed psum (loss_neu packs into the grads+aux vector,
    never its own collective)."""
    from varnet_tpu.fem.assembly import pad_flux
    from varnet_tpu.parallel.mesh import shard_flux
    from varnet_tpu.problems.analytic import steady_ad_2d_neumann

    case = steady_ad_2d_neumann()
    fd = build_fixed_data(case["pde"], 8, b_disc_num=8, pad_multiple=8)
    mesh = make_mesh(8)
    quad = shard_quad(pad_quad(fd.quad, 8), mesh)
    bc = shard_points(pad_points(fd.bc, 8), mesh)
    neu = shard_flux(pad_flux(fd.neu, 8), mesh)
    loss_fn = make_loss_fn(fd.static)
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(
        init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (16, 16)), mesh
    )
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    w = jnp.asarray([1.0, 10.0, 0.0, 0.0])

    compiled = step.jitted.lower(
        theta, opt_state, quad, bc, None, None, w, None, neu, None
    ).compile()
    hlo = compiled.as_text()
    import re

    total = len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )
    assert total == 1, f"expected exactly 1 all-reduce, found {total}"


def test_step_hard_bc_still_one_all_reduce():
    """Exact-BC mode swaps penalty rows for transform tables; the tables
    shard with the quad rows and the step keeps the single packed psum
    (fem/hardbc.py)."""
    from varnet_tpu.fem.hardbc import HardBC
    from varnet_tpu.parallel.mesh import shard_hard

    case = steady_ad_1d()
    fd = build_fixed_data(case["pde"], 24, pad_multiple=8)
    mesh = make_mesh(8)
    quad_h = pad_quad(fd.quad, 8)
    quad = shard_quad(quad_h, mesh)
    bc = shard_points(pad_points(fd.bc, 8), mesh)
    hb = HardBC(case["pde"])
    hard = shard_hard((hb.tables(quad_h.coords), None, None), mesh)
    loss_fn = make_loss_fn(fd.static, hard_mode=True)
    opt = make_optimizer(OptimizerConfig())
    theta = replicate(
        init_mlp(jax.random.PRNGKey(0), fd.static.n_inputs, (16, 16)), mesh
    )
    opt_state = replicate(opt.init(theta), mesh)
    step = make_train_step(loss_fn, opt, mesh=mesh, donate=False)
    w = jnp.asarray([1.0, 0.0, 0.0, 0.0])

    compiled = step.jitted.lower(
        theta, opt_state, quad, bc, None, None, w, None, None, hard
    ).compile()
    hlo = compiled.as_text()
    import re

    total = len(re.findall(r"= \S* all-reduce\(", hlo)) + len(
        re.findall(r"= \S* all-reduce-start\(", hlo)
    )
    assert total == 1, f"expected exactly 1 all-reduce, found {total}"
