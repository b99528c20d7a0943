"""Levenberg-Marquardt refinement (matrix-free Gauss-Newton + CG).

The variational loss is EXACTLY a nonlinear least-squares problem:

    L(theta) = || r_full(theta) ||^2,
    r_full = [ sqrt(w_int/K) r_k / vol,  sqrt(w_bc/N_bc) e_bc,
               sqrt(w_ic/N_ic) e_ic,     sqrt(w_obs/N_obs) e_obs ]

so Gauss-Newton curvature (J^T J) is available matrix-free through one
jvp + one vjp per CG iteration — no Hessian, no materialized jacobian.
Near the optimum this converges superlinearly where first-order methods
crawl through the final error decade (measured: Adam plateaus ~1.6e-3 on
the flagship; see BASELINE.md).  Beyond-reference capability (the TF1
reference has Adam/RMSProp only — SURVEY.md §2.1 #2).

All device work is jitted: each LM iteration is ONE compiled function
(residual + CG loop + trust-region accept/reject via lax.cond).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import make_input_scaling, mlp_apply, mlp_value_and_jac
from ..ops.residual import weak_residual


def make_residual_fn(
    static,
    activation: str = "tanh",
    input_scaling: bool = True,
    value_and_jac: Callable = mlp_value_and_jac,
    apply_fn: Callable = mlp_apply,
    source_fn: Optional[Callable] = None,
    diff_fn: Optional[Callable] = None,
    vel_fn: Optional[Callable] = None,
    has_obs: bool = False,
    n_obs_real: int = 1,
    k_chunks: int = 1,
    has_react: bool = False,
    nl_vec=None,
    flux_value_and_jac: Optional[Callable] = None,
    hard_mode: bool = False,
):
    """Weighted residual VECTOR r_full(theta) with sum(r^2) == total loss
    (the normalize_residual=True convention of make_loss_fn).

    hard_mode: exact BC/IC imposition (fem/hardbc.py) — residual_fn gains
    a ``hard = (HardQuad at quad coords, HardPts at obs coords or None,
    HardQuad at flux-penalty coords or None)`` operand; the interior rows
    use the transformed solution, the (identically-zero) BC/IC rows drop
    out, and observation/flux rows compare the transformed solution.

    k_chunks > 1 maps the interior residual over chunks of the test-
    function axis with rematerialization (jax.checkpoint), bounding the
    memory of jvp/vjp linearization at large problem sizes (the K axis
    must be divisible by k_chunks — pad accordingly).
    """
    d = static.n_space
    td = static.time_dependent
    n_in = static.n_inputs
    n_bc = float(max(static.n_bc, 1))
    n_ic = float(max(static.n_ic, 1))
    n_obs = float(max(int(n_obs_real), 1))
    n_neu = float(max(getattr(static, "n_neu", 0), 1))
    n_k = float(max(static.n_test, 1))
    nl_vec = None if nl_vec is None else jnp.asarray(nl_vec, jnp.float32)
    need_u = has_react or nl_vec is not None
    if input_scaling:
        scale, shift = make_input_scaling(static.input_lo, static.input_hi)
    else:
        scale = shift = None

    def net_params(theta):
        return theta["net"] if isinstance(theta, dict) and "net" in theta else theta

    def interior(theta, coords, kappa, vel, src_fixed, react, mask,
                 n_tbl, dn_tbl, w_tbl, hq=None):
        net = net_params(theta)
        k, nq = coords.shape[0], coords.shape[1]
        flat = coords.reshape(k * nq, n_in)
        u, du = value_and_jac(net, flat, activation, scale, shift)
        grad_u = du[:, :d].reshape(k, nq, d)
        u_t = du[:, d].reshape(k, nq) if td else None
        if hard_mode:
            from ..fem.hardbc import hard_transform

            u_h, grad_u, u_t = hard_transform(
                u.reshape(k, nq), grad_u, u_t, hq
            )
            u = u_h.reshape(k * nq)
        if source_fn is not None:
            t_flat = flat[:, d] if td else None
            src = source_fn(theta["src"], flat[:, :d], t_flat).reshape(k, nq)
        else:
            src = src_fixed
        if diff_fn is not None:
            t_flat = flat[:, d] if td else None
            kappa = diff_fn(theta["kap"], flat[:, :d], t_flat).reshape(k, nq)
        if vel_fn is not None:
            t_flat = flat[:, d] if td else None
            vel = vel_fn(theta["vel"], flat[:, :d], t_flat).reshape(k, nq, d)
        r = weak_residual(
            grad_u, n_tbl, dn_tbl, w_tbl, kappa, vel, src, u_t,
            u=u.reshape(k, nq) if need_u else None,
            react=react if has_react else None,
            nl_vec=nl_vec,
        )
        vol = jnp.sum(w_tbl, axis=-1) if w_tbl.ndim == 2 else jnp.sum(w_tbl)
        return (r / vol) * mask

    def residual_fn(theta, quad, bc, ic=None, obs=None,
                    weights=(1.0, 1.0, 1.0, 0.0), neu=None, hard=None):
        weights = jnp.asarray(weights)
        hq = hard[0] if hard_mode else None
        if k_chunks == 1:
            r = interior(
                theta, quad.coords, quad.kappa, quad.vel, quad.src,
                quad.react, quad.mask, quad.N, quad.dN, quad.w, hq,
            )
        else:
            k = quad.coords.shape[0]
            if k % k_chunks:
                raise ValueError(f"K={k} not divisible by k_chunks={k_chunks}")
            kc = k // k_chunks

            tables_per_node = quad.tables_per_node  # order-2 test space

            def body(args):
                coords, kappa, vel, src, react, mask = args[:6]
                rest = args[6:]
                if tables_per_node:
                    tbls, rest = rest[:3], rest[3:]
                else:
                    tbls = (quad.N, quad.dN, quad.w)
                hq_c = None
                if hard_mode:
                    from ..fem.hardbc import HardQuad

                    hq_c = HardQuad(*rest[0])
                return interior(
                    theta, coords, kappa, vel, src, react, mask, *tbls,
                    hq=hq_c,
                )

            leaves = (quad.coords, quad.kappa, quad.vel, quad.src,
                      quad.react, quad.mask)
            if tables_per_node:
                leaves = leaves + (quad.N, quad.dN, quad.w)
            chunked = tuple(
                a.reshape((k_chunks, kc) + a.shape[1:]) for a in leaves
            )
            if hard_mode:
                chunked = chunked + (jax.tree_util.tree_map(
                    lambda a: a.reshape((k_chunks, kc) + a.shape[1:]),
                    tuple(hq),
                ),)
            r = jax.lax.map(jax.checkpoint(body), chunked).reshape(k)
        parts = [jnp.sqrt(weights[0] / n_k) * r]

        net = net_params(theta)
        if not hard_mode:
            u_bc = apply_fn(net, bc.coords, activation, scale, shift)
            parts.append(
                jnp.sqrt(weights[1] / n_bc) * (u_bc - bc.values) * bc.mask
            )
        if ic is not None and not hard_mode:
            u_ic = apply_fn(net, ic.coords, activation, scale, shift)
            parts.append(jnp.sqrt(weights[2] / n_ic) * (u_ic - ic.values) * ic.mask)
        if has_obs:
            if obs is None:
                # silently dropping the data rows would make LM polish an
                # objective MISSING the observation term while the loss
                # keeps decreasing — fail loudly instead (mirrors loss.py)
                raise ValueError("has_obs=True but the obs batch is None")
            u_obs = apply_fn(net, obs.coords, activation, scale, shift)
            if hard_mode:
                u_obs = hard[1].A + hard[1].B * u_obs
            parts.append(
                jnp.sqrt(weights[3] / n_obs) * (u_obs - obs.values) * obs.mask
            )
        if neu is not None:
            # Neumann flux rows (share the Dirichlet weight w_bc); the
            # batch is tiny, so it rides the XLA jac path
            # (flux_value_and_jac) even when the interior is fused.
            vj = flux_value_and_jac or mlp_value_and_jac
            u_n, du_n = vj(net, neu.coords, activation, scale, shift)
            grad_n = du_n[:, :d]
            if hard_mode:
                hn = hard[2]  # transformed fields (fem/hardbc.py)
                grad_n = hn.dA + hn.dB * u_n[:, None] + hn.B[:, None] * grad_n
                u_n = hn.A + hn.B * u_n
            flux = (jnp.einsum("nd,nd->n", grad_n, neu.dirs)
                    + neu.alpha * u_n)  # Robin term; alpha=0 for Neumann
            parts.append(
                jnp.sqrt(weights[1] / n_neu) * (flux - neu.values) * neu.mask
            )
        return jnp.concatenate(parts)

    return residual_fn


class LMState(NamedTuple):
    flat: jax.Array      # raveled parameters
    lam: jax.Array       # damping
    loss: jax.Array      # current ||r||^2


def _diag_probe_est(pullback, n_r, n_probes, dtype, key):
    """Hutchinson estimate of diag(J^T J) through the existing pullback.

    With Rademacher z, E[(J^T z)_j^2] = sum_i J_ij^2 = diag(J^T J)_j, so
    ``n_probes`` extra VJP passes (vmapped) give an unbiased diagonal
    estimate — no materialized jacobian.  The probes are DETERMINISTIC
    (fixed key): the estimator is unbiased for any fixed realization and
    a frozen realization keeps LM iterations reproducible.  A relative
    floor guards against the rare probe-cancellation underestimate
    (overestimating M there would over-amplify that coordinate)."""
    z = jax.random.rademacher(key, (n_probes, n_r), dtype=dtype)
    # lax.map (not vmap): the pullback may close over a custom-VJP Pallas
    # kernel whose bwd has no batching rule — sequential probe VJPs reuse
    # the normal kernel invocation.
    q = jax.lax.map(lambda zz: pullback(zz)[0], z)
    diag = jnp.mean(q * q, axis=0)
    return jnp.maximum(diag, 1e-4 * jnp.mean(diag))


def _leaf_reduce_diag(diag, leaf_segments, n_leaves):
    """Collapse an elementwise diag(J^T J) estimate to per-LEAF means.

    The round-3 A/B showed the ELEMENTWISE Hutchinson diagonal degrades
    final rel-L2 (8.0e-3 vs 6.2e-3, lm_precond_tpu.json): per-element
    probe noise perturbs the CG direction at small lam.  The disparity
    the preconditioner exists to fix is CROSS-LAYER curvature scale, so
    reduce to one scalar per parameter leaf: the same probes estimate a
    per-leaf TRACE, whose relative variance shrinks with the leaf size
    (averaging n_probes x leaf_dim squared entries), and within-leaf
    directions are left untouched (VERDICT r3 item 9)."""
    seg = jax.ops.segment_sum(diag, leaf_segments, num_segments=n_leaves)
    cnt = jax.ops.segment_sum(jnp.ones_like(diag), leaf_segments,
                              num_segments=n_leaves)
    return (seg / jnp.maximum(cnt, 1.0))[leaf_segments]


_PROBE_KEY_SEED = 7


def make_lm_step(
    residual_closure: Callable,  # flat_params -> r vector
    cg_iters: int = 50,
    lam_up: float = 4.0,
    lam_down: float = 0.5,
    cg_segment: int = 0,
    residual_jvp: Optional[Callable] = None,
    mesh=None,
    data=None,
    data_specs=None,
    precond: int = 0,
    leaf_segments=None,
    precond_mode: str = "diag",
):
    """One Levenberg-Marquardt iteration on RAVELED parameters.

    residual_closure must close over the (device-resident) fixed data.

    residual_jvp: optional forward-mode-capable twin of residual_closure
    (same values, supports ``jax.jvp``).  The fused Pallas evaluation has
    separate custom-JVP and custom-VJP wrappers (JAX allows one rule per
    function), so LM takes both: J v rides the JVP twin, J^T w rides the
    VJP one.  Defaults to residual_closure (the XLA path supports both).

    precond > 0: Jacobi-preconditioned CG.  diag(J^T J) is estimated by
    ``precond`` Hutchinson probes (sequential VJPs once per LM
    iteration, amortized over all ``cg_iters`` applications) and CG runs
    on M^{-1}(J^T J + lam I) with M = diag + lam — the exact diagonal of
    the damped system.  Helps when parameter curvature scales vary
    across layers/biases (A/B harness: benchmarks/lm_precond_probe.py);
    the probe cost is ~precond/cg_iters of a step.  0 = plain CG
    (default).

    precond_mode: 'leaf' collapses the diagonal estimate to a
    per-parameter-leaf mean (low-variance trace estimate; needs
    ``leaf_segments``, an int array mapping each flat index to its leaf)
    — the elementwise probe noise was measured to DEGRADE final rel-L2
    (lm_precond_tpu.json, _leaf_reduce_diag).  'diag' (default at this
    level; ``VarNet.refine_lm`` defaults to 'leaf') keeps the
    elementwise estimate.

    cg_segment == 0: linearize + CG + accept fused into ONE jitted
    program — fastest, but a long program at large cg_iters can exceed
    device execution deadlines (observed ~2 min on the TPU tunnel).
    cg_segment > 0: CG runs in host-looped segments of that many
    iterations, each a bounded program; the jacobian linearization is
    recomputed per segment (one extra forward each).

    mesh: when given, the step is an EXPLICIT ``shard_map`` over the
    ``data`` mesh axis — the same design as the Adam step (SURVEY.md
    §2.2): per-shard residual/jvp/vjp with a small fixed number of packed
    ``psum`` collectives (one per CG application, inside the fori_loop
    body; one packed init; one accept) instead of relying on the GSPMD
    auto-partitioner, which was measured to REPLICATE the whole LM
    computation per partition (zero collectives, 8x redundant work —
    tests/test_lm_multichip.py pins the fixed structure).  In this mode
    ``residual_closure``/``residual_jvp`` take ``(flat, data)`` where
    ``data`` is the sharded pytree and ``data_specs`` its PartitionSpec
    tree; both must compute the PER-SHARD slice of the residual vector.
    """
    if precond and precond_mode == "leaf" and leaf_segments is None:
        raise ValueError(
            "precond_mode='leaf' requires leaf_segments (flat-index -> "
            "leaf-id map); pass precond_mode='diag' for the legacy "
            "elementwise estimate"
        )
    if mesh is not None:
        return _make_lm_step_sharded(
            residual_closure, cg_iters, lam_up, lam_down, cg_segment,
            residual_jvp, mesh, data, data_specs, precond,
            leaf_segments, precond_mode,
        )
    if residual_jvp is None:
        residual_jvp = residual_closure
    n_probes = int(precond)
    segs = (None if leaf_segments is None
            else jnp.asarray(leaf_segments, jnp.int32))
    n_leaves = 0 if segs is None else int(np.max(leaf_segments)) + 1

    def loss_of(flat):
        r = residual_closure(flat)
        return jnp.dot(r, r)

    def make_cg_body(flat, lam, pullback, minv=None):
        def jtj_v(v):
            jv = jax.jvp(residual_jvp, (flat,), (v,))[1]
            return pullback(jv)[0] + lam * v

        def cg_body(_, carry):
            # Preconditioned CG on (J^T J + lam I) with M^{-1} = minv
            # (elementwise); minv=None is plain CG (z == res, rz == |res|^2
            # — identical arithmetic to the unpreconditioned recursion).
            x, p, res, rz = carry
            ap = jtj_v(p)
            alpha = rz / jnp.maximum(jnp.dot(p, ap), 1e-30)
            x = x + alpha * p
            res = res - alpha * ap
            z = res if minv is None else minv * res
            rz_new = jnp.dot(res, z)
            p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
            return (x, p, res, rz_new)

        return cg_body

    def cg_carry0(b, minv):
        z0 = b if minv is None else minv * b
        return (jnp.zeros_like(b), z0, b, jnp.dot(b, z0))

    def make_minv(pullback, n_r, lam, dtype):
        if not n_probes:
            return None
        diag = _diag_probe_est(
            pullback, n_r, n_probes, dtype,
            jax.random.PRNGKey(_PROBE_KEY_SEED),
        )
        if precond_mode == "leaf":
            diag = _leaf_reduce_diag(diag, segs, n_leaves)
        return 1.0 / (diag + lam)

    def accept_impl(flat, lam, loss, delta):
        cand = flat + delta
        cand_loss = loss_of(cand)
        improved = cand_loss < loss
        new_flat = jnp.where(improved, cand, flat)
        new_loss = jnp.where(improved, cand_loss, loss)
        new_lam = jnp.where(improved, lam * lam_down, lam * lam_up)
        return LMState(
            flat=new_flat, lam=jnp.clip(new_lam, 1e-12, 1e6), loss=new_loss
        )

    if cg_segment and int(cg_segment) > 0:
        seg = int(cg_segment)

        @jax.jit
        def cg_init(flat, lam):
            r, pullback = jax.vjp(residual_closure, flat)
            b = -pullback(r)[0]
            minv = make_minv(pullback, r.shape[0], lam, r.dtype)
            return cg_carry0(b, minv), jnp.dot(r, r), minv

        @functools.partial(jax.jit, static_argnames="n")
        def cg_run_segment(flat, lam, carry, minv, n):
            _, pullback = jax.vjp(residual_closure, flat)
            body = make_cg_body(flat, lam, pullback, minv)
            return jax.lax.fori_loop(0, n, body, carry)

        accept = jax.jit(accept_impl)

        def step(state: LMState) -> LMState:
            flat, lam = state.flat, state.lam
            carry, loss, minv = cg_init(flat, lam)
            # exact cg_iters total: full segments + a remainder segment
            # (the old round-UP ran up to seg-1 extra CG iterations plus
            # an extra re-linearization per LM step)
            done = 0
            while done < int(cg_iters):
                n = min(seg, int(cg_iters) - done)
                carry = cg_run_segment(flat, lam, carry, minv, n=n)
                done += n
            return accept(flat, lam, loss, carry[0])

        return step

    def step(state: LMState) -> LMState:
        flat, lam = state.flat, state.lam
        r, pullback = jax.vjp(residual_closure, flat)
        loss = jnp.dot(r, r)
        b = -pullback(r)[0]
        minv = make_minv(pullback, r.shape[0], lam, r.dtype)
        body = make_cg_body(flat, lam, pullback, minv)
        delta, *_ = jax.lax.fori_loop(0, cg_iters, body, cg_carry0(b, minv))
        return accept_impl(flat, lam, loss, delta)

    return jax.jit(step)


def _make_lm_step_sharded(
    res, cg_iters, lam_up, lam_down, cg_segment, res_jvp, mesh, data,
    data_specs, precond=0, leaf_segments=None, precond_mode="diag",
):
    """shard_map LM step: per-shard linear algebra, packed psums (see
    make_lm_step docstring).  Collective census per iteration: 1 packed
    all-reduce at init (b ++ [diag probes] ++ loss), 1 inside the CG
    while-body (J^T J v), 1 at accept (candidate loss) — pinned by
    test_lm_multichip.py.  The Jacobi diagonal estimate (precond > 0)
    rides the init psum: per-shard probes z_s are INDEPENDENT Rademacher
    (key folded by axis index), so the per-shard squares
    (J_s^T z_s)^2 sum to an unbiased diag(J^T J) — the residual rows are
    disjoint across shards and cross-shard cross-terms have zero mean."""
    import functools

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    if res_jvp is None:
        res_jvp = res
    n_probes = int(precond)
    segs = (None if leaf_segments is None
            else jnp.asarray(leaf_segments, jnp.int32))
    n_leaves = 0 if segs is None else int(np.max(leaf_segments)) + 1
    psum = functools.partial(jax.lax.psum, axis_name=DATA_AXIS)
    rep = P()
    state_spec = LMState(flat=rep, lam=rep, loss=rep)

    def make_cg_body(flat, lam, data, pullback, minv=None):
        def jtj_v(v):
            jv = jax.jvp(lambda f: res_jvp(f, data), (flat,), (v,))[1]
            return psum(pullback(jv)[0]) + lam * v

        def cg_body(_, carry):
            # Preconditioned CG; minv=None degenerates to the plain
            # recursion (z == resid, rz == |resid|^2).
            x, p, resid, rz = carry
            ap = jtj_v(p)
            alpha = rz / jnp.maximum(jnp.dot(p, ap), 1e-30)
            x = x + alpha * p
            resid = resid - alpha * ap
            z = resid if minv is None else minv * resid
            rz_new = jnp.dot(resid, z)
            p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
            return (x, p, resid, rz_new)

        return cg_body

    def cg_carry0(b, minv):
        z0 = b if minv is None else minv * b
        return (jnp.zeros_like(b), z0, b, jnp.dot(b, z0))

    def init_parts(flat, lam, data):
        """(b, loss, minv, pullback) — b/loss/diag reduced in ONE psum."""
        r, pullback = jax.vjp(lambda f: res(f, data), flat)
        b_part = -pullback(r)[0]
        n = b_part.shape[0]
        parts = [b_part]
        if n_probes:
            key = jax.random.fold_in(
                jax.random.PRNGKey(_PROBE_KEY_SEED),
                jax.lax.axis_index(DATA_AXIS),
            )
            z = jax.random.rademacher(key, (n_probes, r.shape[0]),
                                      dtype=r.dtype)
            # lax.map, not vmap — see _diag_probe_est.
            q = jax.lax.map(lambda zz: pullback(zz)[0], z)
            parts.append(jnp.mean(q * q, axis=0))
        packed = psum(jnp.concatenate(parts + [jnp.dot(r, r)[None]]))
        minv = None
        if n_probes:
            diag = packed[n:2 * n]
            diag = jnp.maximum(diag, 1e-4 * jnp.mean(diag))
            if precond_mode == "leaf":
                # reduce AFTER the cross-shard psum: the per-leaf trace
                # estimate sees every shard's residual rows
                diag = _leaf_reduce_diag(diag, segs, n_leaves)
            minv = 1.0 / (diag + lam)
        return packed[:n], packed[-1], minv, pullback

    def accept_impl(flat, lam, loss, delta, data):
        cand = flat + delta
        rc = res(cand, data)
        cand_loss = psum(jnp.dot(rc, rc))
        improved = cand_loss < loss
        new_flat = jnp.where(improved, cand, flat)
        new_loss = jnp.where(improved, cand_loss, loss)
        new_lam = jnp.where(improved, lam * lam_down, lam * lam_up)
        return LMState(
            flat=new_flat, lam=jnp.clip(new_lam, 1e-12, 1e6), loss=new_loss
        )

    def smap(fn, in_specs, out_specs):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))

    if cg_segment and int(cg_segment) > 0:
        seg = int(cg_segment)
        minv_spec = rep if n_probes else None

        def cg_init_body(flat, lam, data):
            b, loss, minv, _ = init_parts(flat, lam, data)
            return cg_carry0(b, minv), loss, minv

        def make_cg_seg_body(n):
            def cg_seg_body(flat, lam, carry, minv, data):
                _, pullback = jax.vjp(lambda f: res(f, data), flat)
                body = make_cg_body(flat, lam, data, pullback, minv)
                return jax.lax.fori_loop(0, n, body, carry)

            return cg_seg_body

        def accept_body(flat, lam, loss, delta, data):
            return accept_impl(flat, lam, loss, delta, data)

        cg_init = smap(cg_init_body, (rep, rep, data_specs),
                       ((rep,) * 4, rep, minv_spec))
        seg_specs = ((rep, rep, (rep,) * 4, minv_spec, data_specs),
                     (rep,) * 4)
        cg_seg = smap(make_cg_seg_body(seg), *seg_specs)
        rem = int(cg_iters) % seg
        # exact cg_iters total (the old round-UP ran up to seg-1 extra
        # CG iterations plus an extra re-linearization per LM step)
        cg_rem = smap(make_cg_seg_body(rem), *seg_specs) if rem else None
        accept = smap(accept_body, (rep, rep, rep, rep, data_specs),
                      state_spec)

        def step(state: LMState) -> LMState:
            flat, lam = state.flat, state.lam
            carry, loss, minv = cg_init(flat, lam, data)
            for _ in range(int(cg_iters) // seg):
                carry = cg_seg(flat, lam, carry, minv, data)
            if cg_rem is not None:
                carry = cg_rem(flat, lam, carry, minv, data)
            return accept(flat, lam, loss, carry[0], data)

        return step

    def step_body(state, data):
        flat, lam = state.flat, state.lam
        b, loss, minv, pullback = init_parts(flat, lam, data)
        body = make_cg_body(flat, lam, data, pullback, minv)
        delta, *_ = jax.lax.fori_loop(0, cg_iters, body, cg_carry0(b, minv))
        return accept_impl(flat, lam, loss, delta, data)

    jitted = smap(step_body, (state_spec, data_specs), state_spec)

    def step(state: LMState) -> LMState:
        return jitted(state, data)

    # Exposed for the collective-census regression test
    # (tests/test_lm_multichip.py): the jitted body + its data operand.
    step.jitted = jitted
    step.data = data
    return step
