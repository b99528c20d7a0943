"""High-level orchestrator: the ``VarNet`` class.

TPU-native re-implementation of the reference's user-facing trainer
(reference: ``VarNet.py`` class ``VarNet`` — SURVEY.md §1 public-surface
table: ``VarNet(pde, layerWidth, discNum, bDiscNum, tDiscNum, ...)``,
``.train(epochNum, weight, batchNum, saveFreq, folderpath)``,
``.loadModel()``, ``.evaluate()``, ``.simRes()``).  Same capability
surface, TPU-first internals:

  * fixed data assembled once on host, then sharded over the device mesh
    and kept resident (the reference re-fed it every step — SURVEY.md §3.2);
  * one jitted epoch step (optionally scanning mini-batches) with donated
    parameter/optimizer buffers;
  * gradients all-reduced by XLA across the ``data`` mesh axis — the
    idiomatic replacement for the reference's TF1 multi-tower averaging
    (SURVEY.md §2.2/§5.8).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fem.assembly import (
    FixedData,
    PointData,
    build_fixed_data,
    pad_flux,
    pad_points,
    pad_quad,
)
from .models.mlp import init_mlp, param_count
from .parallel.mesh import (
    DATA_AXIS,
    batched_quad_sharding,
    data_sharding,
    make_mesh,
    replicate,
    shard_flux,
    shard_hard,
    shard_points,
    shard_quad,
)
from .problems.adpde import ADPDE
from .train.checkpoint import (
    list_checkpoint_steps,
    load_checkpoint,
    load_meta,
    save_checkpoint,
    save_meta,
)
from .train.loss import make_loss_fn
from .train.optim import OptimizerConfig, make_optimizer
from .train.trainer import (
    EnsembleResult,
    TrainResult,
    _pad_batched_axis1,
    _tree_reshape_batches,
    make_eval_fn,
    make_train_step,
)
from .utils.helpers import matmul_precision_scope, pair_mats, rel_l2_error


class VarNet:
    """Variational PDE solver: neural trial function + weak-form loss.

    Parameters mirror the reference constructor (SURVEY.md §1):
      pde:          ADPDE problem definition
      layer_width:  hidden-layer widths of the MLP trial function
      disc_num:     spatial elements per dimension (int or per-dim seq)
      b_disc_num:   boundary points per segment edge
      t_disc_num:   time elements (time-dependent problems only)
      integ_p_num:  Gauss-Legendre points per dim per element
      test_order:   1 = multilinear hat test functions (the reference's
                    space); 2 = quadratic Lagrange test space (beyond-
                    reference: O(h^3) invisible-error floor instead of
                    the measured 0.21 h^2 — see fem/element.py).  The
                    shared-table fused residual kernel requires order 1;
                    order 2 AUTO-selects the fully-fused PRECOEFF kernel
                    (measured 2.3x the value+jac fallback at identical
                    rel-L2, order2_floor.json) when eligible (plain MLP,
                    linear PDE, directional layout), else the fused
                    value+jacobian kernel / XLA path.
      activation:   'tanh' | 'sigmoid'
      seed:         PRNG seed for parameter init
      n_devices:    restrict the data-parallel mesh (default: all devices)
      dtype:        parameter/compute dtype (float32 default; quadrature
                    tables are cast to it on device placement)
      optimizer:    OptimizerConfig (Adam by default, as the reference)
      source_fn:    trainable source hook for inverse source identification
                    (BASELINE config 5): ``source_fn(phi, x, t) -> [P]``
      source_init:  initial pytree phi for source_fn
      diff_fn:      trainable DIFFUSIVITY hook for inverse coefficient
                    identification (beyond-reference):
                    ``diff_fn(psi, x, t) -> [P]`` kappa field; theta
                    gains a ``'kap'`` leaf initialized to diff_init.
                    Rides the value+jac path (kappa multiplies the
                    du . dN contraction, which the fused residual
                    kernel bakes into fixed data)
      diff_init:    initial pytree psi for diff_fn
      vel_fn:       trainable VELOCITY hook for inverse flow
                    identification (the reference paper's mass-transport
                    setting): ``vel_fn(phi, x, t) -> [P, d]``; theta
                    gains a ``'vel'`` leaf initialized to vel_init.
                    Same value+jac-path gating as diff_fn
      vel_init:     initial pytree phi for vel_fn
      obs_data:     observation PointData for inverse problems
      hard_bc:      EXACT Dirichlet-BC/IC imposition (beyond-reference —
                    fem/hardbc.py): the trial solution becomes
                    ``G + tau(t) D(x) net(x, t)`` with an R-function
                    distance D and a blended boundary-data extension G,
                    so Dirichlet/IC penalty rows (and their weight
                    tuning) drop out and only the interior weak residual
                    (+ any flux penalties, evaluated on the transformed
                    solution) trains.  Supported domains: interval / box
                    / polygon (non-convex via trimmed segment ADFs);
                    composes with MOR (per-mu tables) and batch_num > 1
                    (tables scan with the quad mini-batches).  Hot path:
                    plain-MLP linear problems ride the fully-fused
                    PRECOEFF residual kernel (the affine ansatz folds
                    into the precomputed integrand coefficients —
                    prepare_residual_coeffs ``hard=``, auto-selected);
                    FF / nonlinear / inverse-coefficient combinations
                    ride the value+jacobian evaluator; refine_lm always
                    does.
    """

    def __init__(
        self,
        pde: ADPDE,
        layer_width: Sequence[int] = (20, 20),
        disc_num=20,
        b_disc_num: int = 10,
        t_disc_num: Optional[int] = None,
        integ_p_num: int = 2,
        test_order: int = 1,
        activation: str = "tanh",
        seed: int = 0,
        n_devices: Optional[int] = None,
        dtype=jnp.float32,
        optimizer: Optional[OptimizerConfig] = None,
        input_scaling: bool = True,
        source_fn: Optional[Callable] = None,
        source_init: Any = None,
        diff_fn: Optional[Callable] = None,
        diff_init: Any = None,
        vel_fn: Optional[Callable] = None,
        vel_init: Any = None,
        obs_data: Optional[PointData] = None,
        use_pallas="auto",
        use_fused_residual: bool = True,
        fused_directional: bool = True,
        fused_q_block: Optional[int] = None,
        fused_precoeff: bool = False,
        fused_sublane_pad: bool = False,
        fourier_features: Optional[int] = None,
        fourier_scale=0.5,
        omega0: float = 6.0,
        hard_bc: bool = False,
    ):
        self.pde = pde
        self.layer_width = tuple(int(w) for w in layer_width)
        self.disc_num = disc_num
        self.b_disc_num = int(b_disc_num)
        self.t_disc_num = None if t_disc_num is None else int(t_disc_num)
        self.integ_p_num = int(integ_p_num)
        # 1 = reference hat test space; 2 = quadratic Lagrange test space
        # (beyond-reference: O(h^3) invisible-error floor, fem/element.py)
        self.test_order = int(test_order)
        self.activation = activation
        self.seed = int(seed)
        self.dtype = dtype
        self.optimizer_cfg = optimizer or OptimizerConfig()
        self.input_scaling = bool(input_scaling)
        self.source_fn = source_fn
        self.diff_fn = diff_fn
        self.vel_fn = vel_fn
        self.obs_data = obs_data
        self.use_fused_residual = bool(use_fused_residual)
        # Directional-tangent residual kernel (2 packed panels) vs the
        # round-1 jacobian-panel kernel (1 + n_in panels); see
        # ops/pallas_residual.py.  The switch exists for benchmarking.
        self.fused_directional = bool(fused_directional)
        # Quadrature points per kernel program (None = kernel auto: the
        # largest G in {4,2} fitting the MXU height — measured best on
        # v5e, benchmarks/results/kernel_probe.json).
        self.fused_q_block = fused_q_block
        # Precomputed-coefficient kernel variant: integrand coefficients
        # folded into the prepared data (no in-kernel table work); the
        # only fused path that supports test_order=2 — AUTO-selected for
        # per-node tables / hard BC via _precoeff_selected (TPU-measured
        # 2.3x at order 2; -3% at the order-1 flagship shape, so order 1
        # keeps the in-kernel-table directional variant).  This flag is
        # the explicit opt-in for order-1 benchmarking.
        self.fused_precoeff = bool(fused_precoeff)
        # Sublane-aligned hidden widths (pad to multiples of 8) for the
        # precoeff kernel: admits larger aligned q-blocks (G=5 at width
        # 20->24).  Experimental, TPU-measure before defaulting.
        self.fused_sublane_pad = bool(fused_sublane_pad)
        # Fail inconsistent kernel-knob combinations HERE, not minutes
        # later inside the first jitted train step on the device.
        if self.fused_precoeff and not self.fused_directional:
            raise ValueError("fused_precoeff=True requires fused_directional=True")
        if self.fused_sublane_pad and not self.fused_precoeff:
            raise ValueError("fused_sublane_pad=True requires fused_precoeff=True")
        if source_fn is not None and source_init is None:
            raise ValueError("source_fn requires source_init")
        if diff_fn is not None and diff_init is None:
            raise ValueError("diff_fn requires diff_init")
        if vel_fn is not None and vel_init is None:
            raise ValueError("vel_fn requires vel_init")

        self.mesh = make_mesh(n_devices)
        self.n_shards = self.mesh.shape[DATA_AXIS]
        # Fused Pallas forward+jacobian kernel on TPU (6x+ step speedup,
        # benchmarks/kernel_bench.py); the matmul-chain path elsewhere.
        if use_pallas == "auto":
            self.use_pallas = jax.devices()[0].platform == "tpu"
        else:
            self.use_pallas = bool(use_pallas)

        self.has_react = not (
            pde.react is None
            or (np.isscalar(pde.react) and float(pde.react) == 0.0)
        )
        # Constant Burgers direction b (validated by ADPDE.__post_init__;
        # None for linear problems).  The nonlinear term u (b . grad u) is
        # BILINEAR in (u, du), so only the jacobian-panel fused kernel can
        # express it — force directional off so every layout decision
        # (hook, prepared layouts) agrees (DESIGN.md decision 16).
        self.nl_vec = getattr(pde, "nl_adv", None)
        if diff_fn is not None:
            from .problems.adpde import NeumannBC, RobinBC

            if any(isinstance(g, (NeumannBC, RobinBC)) for g in pde.bcs):
                raise ValueError(
                    "diff_fn (trainable kappa) is incompatible with "
                    "Neumann/Robin BCs: FluxData bakes kappa-scaled "
                    "normals at assembly time"
                )
        if self.nl_vec is not None and not self.fused_precoeff:
            self.fused_directional = False
        # Exact BC/IC imposition: host-side transform builder; its fixed
        # tables are derived from the (padded) quad coords at train time,
        # so re-assembly (refine_tests) needs no extra bookkeeping.
        self.hard = None
        if hard_bc:
            from .fem.hardbc import HardBC

            self.hard = HardBC(pde)
        self.fixed: FixedData = build_fixed_data(
            pde,
            disc_num,
            b_disc_num=self.b_disc_num,
            t_disc_num=self.t_disc_num,
            integ_p_num=self.integ_p_num,
            pad_multiple=1,
            test_order=self.test_order,
        )
        self.static = self.fixed.static

        key = jax.random.PRNGKey(self.seed)
        # Optional random-Fourier-feature embedding (fixed matrix B) to
        # counter MLP spectral bias on oscillatory solutions.
        self.fourier_b = None
        self._value_and_jac_default = None
        apply_override = None
        net_in = self.static.n_inputs
        if fourier_features is not None:
            import functools

            from .models.mlp import ff_apply, ff_value_and_jac, make_fourier_features

            key, sub = jax.random.split(key)
            # fourier_scale: float, or a sequence of floats for a
            # multi-scale basis (see make_fourier_features).
            self.fourier_b = make_fourier_features(
                sub, self.static.n_inputs, int(fourier_features),
                scale=fourier_scale,
            )
            net_in = 2 * int(fourier_features)
            self._value_and_jac_default = functools.partial(
                ff_value_and_jac, self.fourier_b
            )
            apply_override = functools.partial(ff_apply, self.fourier_b)
        if activation == "sin":
            from .models.mlp import init_siren

            def _init_net(k):
                return init_siren(
                    k, net_in, self.layer_width, n_out=1,
                    omega0=float(omega0), dtype=dtype,
                )
        else:
            def _init_net(k):
                return init_mlp(k, net_in, self.layer_width, n_out=1,
                                dtype=dtype)

        def _init_theta(k):
            net = _init_net(k)
            if (source_fn is not None or diff_fn is not None
                    or vel_fn is not None):
                th = {"net": net}
                if source_fn is not None:
                    th["src"] = source_init
                if diff_fn is not None:
                    th["kap"] = diff_init
                if vel_fn is not None:
                    th["vel"] = vel_init
                return th
            return net

        # Re-initializer for fresh members (train_ensemble) — same
        # architecture/embedding, different key.
        self._init_theta = _init_theta
        self.theta: Any = _init_theta(key)
        self.opt_state = None  # created lazily in train()/load_model()
        # Training-time PRNG stream, checkpointed per SURVEY.md §5.4 so any
        # stochastic feature (minibatch sampling, noise) resumes reproducibly.
        # Raw threefry key data for PRNGKey(seed + 1) — computed HOST-SIDE
        # (np only): __init__ must not touch the device (a device_get here
        # once hit a transient tunnel FAILED_PRECONDITION and killed a run).
        # Consume via jax.random.wrap_key_data when stochastic features land.
        _s = np.uint64(self.seed + 1)
        self.prng_key = np.array(
            [(_s >> np.uint64(32)) & np.uint64(0xFFFFFFFF),
             _s & np.uint64(0xFFFFFFFF)],
            dtype=np.uint64,
        ).astype(np.uint32)
        self.train_result: Optional[TrainResult] = None
        self._ensemble_thetas = None  # stacked pytree after train_ensemble
        self._apply_override = apply_override
        eval_kwargs = {} if apply_override is None else {"apply_fn": apply_override}
        self._eval_fn = make_eval_fn(
            self.static, self.activation, self.input_scaling, **eval_kwargs
        )

    @property
    def _per_node_tables(self) -> bool:
        """True when the quad carries per-node N/dN/w tables — the order-2
        test space OR an adaptively refined (mixed-scale) hat space.  The
        single predicate every hot-path/sharding gate keys on."""
        return self.test_order != 1 or self.fixed.quad.tables_per_node

    @property
    def _precoeff_selected(self) -> bool:
        """True when the PRECOEFF fused-residual variant is in play:
        explicit opt-in, exact-BC imposition (the only fused layout whose
        precomputed coefficients can absorb the affine hard-BC ansatz),
        or AUTO for per-node-table test spaces (order-2 / adaptively
        refined hats) — the shared-[nQ]-table kernels cannot express
        per-node tables, and precoeff measured 2.3x the value+jac
        fallback at identical rel-L2 on the order-2 flagship shape
        (BASELINE.md, order2_floor.json).  The auto clause requires the
        combinations precoeff can express: directional layout, plain MLP
        (no Fourier embedding fold), linear PDE (no jacobian panels).
        Single source of truth for _fused_residual_hook AND
        _prepare_fused_layout — the two must agree or the prepared
        operand layout won't match the kernel."""
        return (
            self.fused_precoeff
            or self.hard is not None
            or (
                self._per_node_tables
                and self.fused_directional
                and self.fourier_b is None
                and self.nl_vec is None
            )
        )

    def _padded_neu(self):
        """Padded host Neumann FluxData, or None — padded ONCE so the
        sharded flux rows and the hard-BC flux tables stay row-aligned by
        construction, not by padding determinism."""
        if self.fixed.neu is None:
            return None
        return pad_flux(self.fixed.neu, self.n_shards)

    def _shard_neu(self, neu_h):
        """Sharded Neumann FluxData from the pre-padded host data (one
        place to change flux placement for train/refine_lm/refine_lbfgs)."""
        if neu_h is None:
            return None
        return shard_flux(neu_h, self.mesh, dtype=self.dtype)

    def _shard_hard(self, quad_h, obs_h, neu_h, batch_num: int = 1,
                    hq=None):
        """Sharded hard-BC transform payload for the given PADDED host
        quad/obs/flux data: (HardQuad at quad coords, HardPts at obs
        coords or None, HardQuad at flux-penalty coords or None) — or
        None when hard_bc is off.  One place so train/refine_lm/
        refine_lbfgs agree.

        ``batch_num > 1``: the quad tables are built at the BATCHED-
        then-flattened coords — the callers batch the quad first
        (device-count-invariant partition: batch split, THEN per-batch
        shard padding) and flatten [B, Kb, ...] -> [B*Kb, ...] before
        handing coords here, so the kb tables built from them reshape
        back to the same [B, Kb, ...] mini-batch layout the trainer
        scans; obs/flux tables stay full-batch like their penalty rows.

        ``hq``: optionally the already-computed quad-coord tables (the
        train path shares one host f64 build between this payload and
        the fused-kernel coefficient fold, _prepare_fused_layout)."""
        if self.hard is None:
            return None
        if hq is None:
            hq = self.hard.tables(quad_h.coords)
        if batch_num > 1:
            kb = hq.A.shape[0] // batch_num
            hq = jax.tree_util.tree_map(
                lambda a: a.reshape((batch_num, kb) + a.shape[1:]), hq
            )
        return shard_hard(
            (
                hq,
                None if obs_h is None else self.hard.points(obs_h.coords),
                None if neu_h is None else self.hard.tables(neu_h.coords),
            ),
            self.mesh, dtype=self.dtype, batched=batch_num > 1,
        )

    def _fused_residual_hook(self, matmul_precision):
        """Fully-fused weak-residual kernel when eligible (plain MLP, fixed
        source), else None — the hot-path selection for TPU training."""
        # Hard BC forces the precoeff variant: the ansatz u = A + B n is
        # AFFINE in the raw network outputs, so exact imposition folds
        # entirely into the precomputed integrand coefficients
        # (prepare_residual_coeffs hard=) and the unchanged kernel
        # computes the transformed residual — the only fused layout that
        # can express it (in-kernel table variants bake the raw-network
        # coefficients).
        precoeff = self._precoeff_selected
        if (
            not self.use_pallas
            or not self.use_fused_residual
            # exact-BC fold needs the directional precoeff kernel: plain
            # MLP only (the FF embedding tangent path has no coefficient
            # fold) and linear PDE (the bilinear u*(b.grad u) term needs
            # jacobian panels)
            or (self.hard is not None
                and (not self.fused_directional
                     or self.fourier_b is not None
                     or self.nl_vec is not None))
            # trainable kappa/velocity multiply the fixed-data du
            # coefficients: value+jac path only (inverse identification)
            or self.diff_fn is not None
            or self.vel_fn is not None
            # nonlinear advection: jacobian-panel kernel only (the ctor
            # forced fused_directional=False); FF/precoeff variants
            # cannot express the bilinear u*(b.grad u) term
            or (self.nl_vec is not None
                and (self.fourier_b is not None or precoeff))
            # Fourier-embedded nets ride the directional kernel (the
            # embedding + its tangent run in-kernel, _embed_dir); the
            # precoeff variant and per-node tables keep the general path
            or (self.fourier_b is not None
                and (not self.fused_directional or precoeff
                     or self._per_node_tables))
            # shared-[nQ]-table kernels can't express per-node tables
            # (order-2 space, adaptively refined hats); the precoeff
            # variant folds the tables into the data and can
            or (self._per_node_tables and not precoeff)
        ):
            return None
        import functools

        from .ops.pallas_residual import pallas_fused_residual

        prec = (
            jax.lax.Precision.HIGHEST
            if matmul_precision in ("highest", "float32")
            else None
        )
        fourier_bt = None
        if self.fourier_b is not None:
            fourier_bt = (2.0 * jnp.pi) * jnp.transpose(
                jnp.asarray(self.fourier_b, jnp.float32)
            )
        return functools.partial(
            pallas_fused_residual,
            time_dependent=self.static.time_dependent,
            has_react=self.has_react,
            precision=prec,
            directional=self.fused_directional,
            q_block=self.fused_q_block,
            precoeff=precoeff,
            sublane_pad=self.fused_sublane_pad,
            fourier_bt=fourier_bt,
            nl_vec=None if self.nl_vec is None else tuple(
                float(v) for v in self.nl_vec),
        )

    def _prepare_fused_layout(self, quad_h, matmul_precision=None,
                              hard_hq=None):
        """Per-shard precomputed (xs, flds) kernel layouts, stacked on a
        leading shard axis and placed with a data-axis NamedSharding.
        Host-side NumPy transform mirroring the in-graph one bit-for-bit
        (both cast to f32 before scaling).

        ``hard_hq``: HardQuad tables at the padded quad coords (exact-BC
        mode) — folded into the precoeff coefficients per shard, so the
        kernel computes the TRANSFORMED residual with zero extra device
        work (prepare_residual_coeffs hard=)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from .fem.assembly import QuadData
        from .models.mlp import make_input_scaling
        from .ops.pallas_residual import (
            prepare_residual_coeffs,
            prepare_residual_layout,
            resolve_layout,
        )

        net = self.theta["net"] if isinstance(self.theta, dict) else self.theta
        h_max = max(l["w"].shape[1] for l in net)
        if self.fused_sublane_pad:
            h_max = -(-h_max // 8) * 8  # layout must match the padded widths
        nq = quad_h.coords.shape[1]
        n_ff = 0 if self.fourier_b is None else int(self.fourier_b.shape[1])
        G, tile = resolve_layout(
            h_max, nq, len(net), self.static.n_inputs,
            activation=self.activation, directional=self.fused_directional,
            interpret=False, tile=None, q_block=self.fused_q_block,
            precision=matmul_precision, n_ff=n_ff,
        )
        if self.input_scaling:
            scale, shift = make_input_scaling(
                self.static.input_lo, self.static.input_hi
            )
            scale, shift = np.asarray(scale), np.asarray(shift)
        else:
            scale = shift = None

        per_node_tables = quad_h.tables_per_node  # order-2 test space
        k_pad = quad_h.coords.shape[0]
        ks = k_pad // self.n_shards
        parts = None
        for s in range(self.n_shards):
            sl = slice(s * ks, (s + 1) * ks)

            def tbl(a):
                return np.asarray(a[sl]) if per_node_tables else a

            shard = QuadData(
                coords=np.asarray(quad_h.coords[sl]), N=tbl(quad_h.N),
                dN=tbl(quad_h.dN), w=tbl(quad_h.w),
                kappa=np.asarray(quad_h.kappa[sl]),
                vel=np.asarray(quad_h.vel[sl]),
                src=np.asarray(quad_h.src[sl]),
                react=np.asarray(quad_h.react[sl]),
                mask=np.asarray(quad_h.mask[sl]),
            )
            if self._precoeff_selected or hard_hq is not None:
                hard_s = None
                if hard_hq is not None:
                    hard_s = jax.tree_util.tree_map(
                        lambda a: np.asarray(a[sl]), hard_hq
                    )
                prep = prepare_residual_coeffs(
                    shard, scale, shift,
                    time_dependent=self.static.time_dependent,
                    has_react=self.has_react, G=G, tile=tile, hard=hard_s,
                )
            else:
                prep = prepare_residual_layout(
                    shard, scale, shift, has_react=self.has_react, G=G,
                    tile=tile,
                )
            if parts is None:
                parts = tuple([] for _ in prep)
            for lst, a in zip(parts, prep):
                lst.append(a)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        return tuple(
            jax.device_put(np.stack(lst), sharding) for lst in parts
        )

    def _pallas_value_and_jac(self, matmul_precision, tile=None):
        """The fused-kernel evaluation path (plain or Fourier-embedded).
        ``tile`` caps the kernel's point tile below its own auto-tiler —
        the LM path passes the ``_auto_tile_lm`` cap (remat-under-while
        VMEM headroom)."""
        import functools

        from .ops.pallas_mlp import pallas_ff_value_and_jac, pallas_value_and_jac

        prec = (
            jax.lax.Precision.HIGHEST
            if matmul_precision in ("highest", "float32")
            else None
        )
        extra = {} if tile is None else {"tile": int(tile)}
        if self.fourier_b is not None:
            return functools.partial(
                pallas_ff_value_and_jac, self.fourier_b, precision=prec,
                **extra,
            )
        return functools.partial(pallas_value_and_jac, precision=prec,
                                 **extra)

    # ------------------------------------------------------------------ #
    # training

    def train(
        self,
        epoch_num: int,
        weight: Optional[Sequence[float]] = None,
        batch_num: int = 1,
        save_freq: int = 500,
        folderpath: Optional[str] = None,
        resume: bool = False,
        verbose: bool = True,
        error_disc: int = 64,
        error_times: int = 5,
        value_and_jac: Optional[Callable] = None,
        target_error: Optional[float] = None,
        normalize_residual: bool = True,
        profile_dir: Optional[str] = None,
        profile_steps: int = 10,
        debug_nans: bool = False,
        matmul_precision: Optional[str] = None,
        max_retries: int = 0,
        retry_backoff: float = 30.0,
    ) -> TrainResult:
        """Run the training loop (reference ``VarNet.train`` — SURVEY.md §3.2).

        weight:      (w_int, w_bc[, w_ic][, w_obs]) loss weights
        batch_num:   interior mini-batches per epoch (scan inside the jit)
        save_freq:   report/checkpoint period (epochs)
        folderpath:  case directory for checkpoints + JSONL training log
        resume:      restore the latest checkpoint from folderpath first;
                     epoch_num then counts TOTAL epochs (global step
                     semantics like refine_lm) — a checkpoint at step >=
                     epoch_num makes this call a no-op, so hang-recovery
                     loops can safely re-run the same command
        error_disc:  eval-grid resolution for rel-L2 error vs pde.c_ex
        target_error: optional early-stop threshold on rel-L2 error
        value_and_jac: override the network value+jacobian path (e.g. the
                     fused Pallas kernel); default is the matmul-chain path
        profile_dir: capture a ``jax.profiler`` trace of ``profile_steps``
                     post-compile epochs into this directory (SURVEY.md §5.1)
        debug_nans:  enable jax NaN checking for the duration of this call
                     (SURVEY.md §5.2 — the sanitizer analog)
        matmul_precision: None | 'default' | 'float32' | 'highest' — MXU
                     precision for ALL matmuls this call (the TPU MXU
                     multiplies in bf16 by default, a ~5e-3 noise floor;
                     'highest' buys exact f32 at ~3x matmul cost, needed
                     for the <1e-3 accuracy targets)
        max_retries: on a transient device fault (see train/fault.py),
                     re-enter the loop up to this many times, resuming
                     from the newest checkpoint when folderpath is set
                     (SURVEY.md §5.3 checkpoint-restart)
        retry_backoff: seconds to sleep before each retry
        """
        if resume and folderpath is None:
            raise ValueError(
                "resume=True requires folderpath (nothing to resume from)"
            )

        def _newest():
            steps = list_checkpoint_steps(folderpath) if folderpath else []
            return steps[-1] if steps else 0

        # Global-epoch accounting: checkpoints this call writes land in
        # (start, target].  ``pre`` distinguishes them from stale
        # checkpoints already in the folder (a fresh resume=False run
        # never resumes from those — it restarts).  With resume=True,
        # ``epoch_num`` is the TOTAL budget (matching refine_lm's global
        # step semantics): a checkpoint at step >= epoch_num means the
        # phase already completed and this call no-ops — hang-recovery
        # re-runs the same command with --resume, and the old additive
        # interpretation re-trained a full extra budget per attempt
        # (measured in anger on the 3-Dt d16 recovery: Adam treadmilled
        # past 33k epochs of a 24k budget and LM never started).
        pre = _newest()
        start = pre if resume else 0
        target = max(int(epoch_num), start) if resume else start + int(epoch_num)
        st = {"epochs": target - start, "resume": resume}
        if resume and target == start:
            # Completed-budget no-op: restore the final iterate and return
            # WITHOUT running the device setup — and, critically, without
            # overwriting the completed run's train_result.json with an
            # empty history (review finding, round 3).
            if verbose:
                print(f"[varnet] resume: {start} epochs already complete "
                      f"(budget {int(epoch_num)}), skipping training")
            step, _ = self._restore_theta(folderpath)
            if step:
                meta = load_meta(folderpath, step)
                if meta is not None and "prng_key" in meta:
                    self.prng_key = np.asarray(meta["prng_key"],
                                               dtype=np.uint32)
            self.train_result = TrainResult()
            return self.train_result

        def attempt_fn():
            with matmul_precision_scope(matmul_precision):
                return self._train_impl(
                    st["epochs"], weight, batch_num, save_freq, folderpath,
                    st["resume"], verbose, error_disc, error_times,
                    value_and_jac, target_error, normalize_residual,
                    profile_dir, profile_steps, debug_nans,
                    matmul_precision,
                )

        def on_fault(_attempt):
            now = _newest()
            trust = now > pre or (resume and now == pre)
            if trust and now >= target:
                # faulted after the final checkpoint: the work is done
                return TrainResult()
            if trust:
                st["resume"], st["epochs"] = True, target - max(now, start)
                return (
                    f"resuming from epoch {max(now, start)} in {folderpath}"
                )
            st["resume"], st["epochs"] = False, int(epoch_num)
            return "restarting from in-memory state (no checkpoint yet)"

        return self._retry_transient(
            attempt_fn, on_fault, max_retries, retry_backoff, verbose,
            label="", include_oom=False,
        )

    def _retry_transient(
        self, attempt_fn, on_fault, max_retries, retry_backoff, verbose,
        label, include_oom,
    ):
        """Shared transient-fault retry loop (SURVEY.md §5.3).

        Runs ``attempt_fn()``; on a transient device error (see
        train/fault.py) calls ``on_fault(attempt)`` to reposition state
        for the next attempt — it returns a description string, or a
        terminal ``TrainResult`` when the checkpoints show the requested
        work already completed.  Program errors propagate immediately.
        """
        from .train.fault import is_transient_device_error

        attempt = 0
        while True:
            try:
                return attempt_fn()
            except jax.errors.JaxRuntimeError as err:
                if attempt >= int(max_retries) or not is_transient_device_error(
                    err, include_oom=include_oom
                ):
                    raise
                attempt += 1
                outcome = on_fault(attempt)
                if isinstance(outcome, TrainResult):
                    return outcome
                if verbose:
                    print(
                        f"[varnet{label}] transient device fault (retry "
                        f"{attempt}/{int(max_retries)}): {outcome} after "
                        f"{float(retry_backoff):.0f}s",
                        flush=True,
                    )
                if retry_backoff > 0:
                    time.sleep(float(retry_backoff))

    def _train_impl(
        self, epoch_num, weight, batch_num, save_freq, folderpath, resume,
        verbose, error_disc, error_times, value_and_jac, target_error,
        normalize_residual, profile_dir, profile_steps, debug_nans,
        matmul_precision,
    ) -> TrainResult:
        td = self.static.time_dependent
        has_obs = self.obs_data is not None
        if weight is None:
            weight = (1.0, 1.0) + ((1.0,) if td else ()) + ((1.0,) if has_obs else ())
        weight = tuple(float(w) for w in weight)
        # Normalize to the 4-slot convention of the loss fn.
        w_full = list(weight) + [0.0] * (4 - len(weight))
        if not td:
            w_full = [w_full[0], w_full[1], 0.0, w_full[2]]

        # Device-count-invariant batching (VERDICT r3 item 6): split into
        # mini-batches FIRST (pad depends only on batch_num), then pad
        # each batch for the shard count — same batch membership for any
        # n_devices (trainer._pad_batched_axis1).
        fused = None if value_and_jac is not None else self._fused_residual_hook(
            matmul_precision
        )
        quad_h = pad_quad(self.fixed.quad,
                          int(batch_num) if batch_num > 1 else self.n_shards)
        if fused is not None and self.source_fn is not None:
            # Inverse-source mode on the fused kernel: the trainable source
            # enters the weak residual LINEARLY, so the kernel integrates
            # with the fixed source field ZEROED and the loss adds the
            # -sum_q w N s_phi term XLA-side (train/loss.py).  Zero it here
            # so both the sharded quad and the prepared layout agree.
            quad_h = quad_h._replace(src=np.zeros_like(quad_h.src))
        bc_h = pad_points(self.fixed.bc, self.n_shards)
        ic_h = None if self.fixed.ic is None else pad_points(self.fixed.ic, self.n_shards)
        obs_h = None if not has_obs else pad_points(self.obs_data, self.n_shards)

        neu_h = self._padded_neu()
        if batch_num > 1:
            # batch membership is already fixed; per-batch shard padding
            # only appends masked filler (device-count invariant)
            quad_h = _tree_reshape_batches(quad_h, batch_num)
            quad_h = _pad_batched_axis1(quad_h, self.n_shards)
        # one host f64 table build serves both the sharded loss operand
        # and (fused path) the per-shard coefficient fold below; in the
        # batched layout the tables are built at the flattened coords and
        # reshaped back inside _shard_hard
        flat_coords = (quad_h.coords.reshape((-1,) + quad_h.coords.shape[2:])
                       if batch_num > 1 else quad_h.coords)
        hard_hq = (None if self.hard is None
                   else self.hard.tables(flat_coords))
        hard_d = self._shard_hard(quad_h, obs_h, neu_h, batch_num=batch_num,
                                  hq=hard_hq)

        if batch_num > 1:
            quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype, batched=True)
        else:
            quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype)
        bc_d = shard_points(bc_h, self.mesh, dtype=self.dtype)
        ic_d = None if ic_h is None else shard_points(ic_h, self.mesh, dtype=self.dtype)
        obs_d = None if obs_h is None else shard_points(obs_h, self.mesh, dtype=self.dtype)
        neu_d = self._shard_neu(neu_h)

        loss_kwargs = {}
        if fused is not None:
            loss_kwargs["fused_residual"] = fused
        elif value_and_jac is None and self.use_pallas:
            value_and_jac = self._pallas_value_and_jac(matmul_precision)
        if value_and_jac is None and self._value_and_jac_default is not None:
            value_and_jac = self._value_and_jac_default
        if value_and_jac is not None:
            loss_kwargs["value_and_jac"] = value_and_jac
        if self._apply_override is not None:
            loss_kwargs["apply_fn"] = self._apply_override
        loss_fn = make_loss_fn(
            self.static,
            activation=self.activation,
            input_scaling=self.input_scaling,
            source_fn=self.source_fn,
            has_obs=has_obs,
            n_obs_real=0 if not has_obs else int(self.obs_data.mask.sum()),
            normalize_residual=normalize_residual,
            has_react=self.has_react,
            nl_vec=self.nl_vec,
            diff_fn=self.diff_fn,
            vel_fn=self.vel_fn,
            flux_value_and_jac=self._value_and_jac_default,
            hard_mode=self.hard is not None,
            **loss_kwargs,
        )
        optimizer = make_optimizer(self.optimizer_cfg)

        # Precompute the fused kernel's per-shard data layout ONCE (the
        # in-graph transform re-executes every step otherwise — ~10% of
        # the bench step; ops/pallas_residual.prepare_residual_layout).
        # f32-only: the host transform casts float64->f32, which matches
        # the in-graph path bit-for-bit only when the device quad arrays
        # are themselves f32 (test_prepared_layout_matches_ingraph); for
        # other dtypes fall back to the in-graph relayout.
        prepared_d = None
        if fused is not None and batch_num == 1 and self.dtype == jnp.float32:
            prepared_d = self._prepare_fused_layout(quad_h, matmul_precision,
                                                    hard_hq=hard_hq)

        theta = replicate(self.theta, self.mesh)
        opt_state = optimizer.init(theta)
        start_epoch = 0
        if resume and folderpath is not None:
            try:
                state, step = load_checkpoint(
                    folderpath, {"theta": theta, "opt_state": opt_state}
                )
            except FileNotFoundError:
                # nothing persisted yet (the previous attempt died before
                # its first save_freq checkpoint): start fresh — the
                # hang-recovery loop re-runs the same command +resume and
                # must make progress, not crash (mirrors refine_lm's
                # tolerant _restore_theta)
                state, step = None, 0
                if verbose:
                    print(f"[varnet] resume: no checkpoints in "
                          f"{folderpath} yet, starting fresh")
            if state is not None:
                theta = replicate(state["theta"], self.mesh)
                opt_state = replicate(state["opt_state"], self.mesh)
                start_epoch = step
                meta = load_meta(folderpath, step)
                if meta is not None and "prng_key" in meta:
                    self.prng_key = np.asarray(meta["prng_key"],
                                               dtype=np.uint32)
                if verbose:
                    print(f"[varnet] resumed from epoch {step} in "
                          f"{folderpath}")
        opt_state = replicate(opt_state, self.mesh)

        step_fn = make_train_step(
            loss_fn, optimizer, mesh=self.mesh, batch_num=batch_num,
            tables_per_node=self._per_node_tables,
            hard_present=hard_d is not None,
        )
        weights_arr = jnp.asarray(w_full, dtype=self.dtype)

        result = TrainResult()
        log_path = None
        if folderpath is not None:
            os.makedirs(folderpath, exist_ok=True)
            log_path = os.path.join(folderpath, "train_log.jsonl")

        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        n_real_quad = self.static.n_test * self.static.n_quad_per_test
        t_start = None  # set after first (compile) step
        timed_epochs = 0
        report_overhead = 0.0  # host+eval time excluded from throughput
        profiling = False
        for epoch in range(start_epoch + 1, start_epoch + int(epoch_num) + 1):
            theta, opt_state, aux = step_fn(
                theta, opt_state, quad_d, bc_d, ic_d, obs_d, weights_arr,
                prepared_d, neu_d, hard_d,
            )
            if t_start is None:
                jax.block_until_ready(aux["loss"])
                t_start = time.perf_counter()
                timed_epochs = 0
                if profile_dir is not None:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                    profile_end = epoch + int(profile_steps)
            else:
                timed_epochs += 1
            if profiling and epoch >= profile_end:
                jax.block_until_ready(aux["loss"])
                jax.profiler.stop_trace()
                profiling = False

            last = epoch == start_epoch + int(epoch_num)
            if epoch % int(save_freq) == 0 or last:
                # Drain the enqueued device work FIRST so it is attributed
                # to the timed window, not to report overhead.
                jax.block_until_ready(aux["loss"])
                t_rep = time.perf_counter()
                aux_host = {k: float(v) for k, v in jax.device_get(aux).items()}
                err = self.compute_error(
                    theta, disc=error_disc, n_times=error_times
                )
                elapsed = time.perf_counter() - t_start
                result.epochs.append(epoch)
                result.losses.append(aux_host)
                result.errors.append(err if err is not None else float("nan"))
                result.wall_times.append(elapsed)
                if verbose:
                    err_s = f"{err:.3e}" if err is not None else "n/a"
                    print(
                        f"[varnet] epoch {epoch:7d}  loss {aux_host['loss']:.4e}"
                        f"  int {aux_host['loss_int']:.3e}"
                        f"  bc {aux_host['loss_bc']:.3e}"
                        + (f"  ic {aux_host['loss_ic']:.3e}" if "loss_ic" in aux_host else "")
                        + f"  relL2 {err_s}  ({elapsed:.1f}s)"
                    )
                if log_path is not None:
                    with open(log_path, "a") as f:
                        f.write(json.dumps({"epoch": epoch, "err": err, **aux_host}) + "\n")
                if folderpath is not None:
                    self.theta = jax.device_get(theta)
                    save_checkpoint(
                        folderpath,
                        epoch,
                        {"theta": self.theta, "opt_state": jax.device_get(opt_state)},
                        config=self.config_dict(),
                    )
                    save_meta(
                        folderpath, epoch,
                        {"prng_key": np.asarray(self.prng_key).tolist()},
                    )
                report_overhead += time.perf_counter() - t_rep
                if target_error is not None and err is not None and err < target_error:
                    if verbose:
                        print(f"[varnet] target error {target_error:.1e} reached")
                    break

        if profiling:
            jax.profiler.stop_trace()
        if debug_nans:
            jax.config.update("jax_debug_nans", False)
        jax.block_until_ready(theta)
        total_time = (
            time.perf_counter() - t_start - report_overhead if t_start else 0.0
        )
        steps = timed_epochs * batch_num
        result.total_steps = steps
        result.steps_per_sec = steps / total_time if total_time > 0 else 0.0
        # Driver metric: quadrature-point residual evaluations per second
        # (each epoch evaluates every real quad point once, across batches).
        result.quad_evals_per_sec = (
            timed_epochs * n_real_quad / total_time if total_time > 0 else 0.0
        )
        self.theta = jax.device_get(theta)
        self.opt_state = jax.device_get(opt_state)
        self.train_result = result
        if folderpath is not None:
            with open(os.path.join(folderpath, "train_result.json"), "w") as f:
                json.dump(result.as_dict(), f, indent=2)
        return result

    def train_ensemble(
        self,
        epoch_num: int,
        n_members: int = 8,
        weight: Optional[Sequence[float]] = None,
        batch_num: int = 1,
        save_freq: int = 500,
        verbose: bool = True,
        error_disc: int = 64,
        error_times: int = 5,
        select: str = "error",
        matmul_precision: Optional[str] = None,
        normalize_residual: bool = True,
    ) -> EnsembleResult:
        """Train ``n_members`` independently-seeded nets SIMULTANEOUSLY.

        TPU-native, beyond-reference capability: the members are stacked
        on a leading axis and the loss is ``vmap``-ed over it, so one
        jitted step trains the whole ensemble — batched matmuls instead
        of E sequential runs.  At reference-scale widths the MXU is
        badly underutilized (BASELINE.md width table), so extra members
        cost far less than Ex wall time.  Uses:

          * seed-variance quantification (how robust is a recipe?),
          * best-of-E selection — the cheap escape from bad basins
            (e.g. the zero-data attractor, DESIGN.md),
          * uncertainty bands from member spread at evaluation.

        Hot path: when the fully-fused weak-residual kernel is eligible
        (same conditions as ``train``) the members run through it via a
        sequential ``lax.map`` — the kernel assumes one weight set per
        program, but at ~40x the XLA path's throughput E sequential fused
        passes beat one vmapped XLA pass for any practical E, and the
        kernel never materializes per-point activations in HBM (the
        vmapped XLA path OOMs at bench-scale meshes: [E, 17.5M, width]
        buffers).  Otherwise the loss is ``vmap``-ed over the stacked
        members (batched matmuls — fine at small meshes).  Either way:
        still one packed psum per step over the data mesh axis.

        Adam/RMSProp/SGD updates are elementwise, so the stacked update
        IS E independent optimizers.  ``grad_clip`` (global-norm) would
        couple members through the joint norm and is rejected.

        select: 'error' (rel-L2 vs pde.c_ex, default) or 'loss' — the
        criterion for the winning member.  After the run ``self.theta``
        holds the winner, ready for ``refine_lm``/``evaluate``; the full
        stacked pytree is returned for ensemble-statistics use.
        """
        if int(n_members) < 2:
            raise ValueError("train_ensemble needs n_members >= 2")
        if select not in ("error", "loss"):
            raise ValueError("select must be 'error' or 'loss'")
        if self.optimizer_cfg.grad_clip is not None:
            raise ValueError(
                "grad_clip couples ensemble members through the joint "
                "global norm; use grad_clip=None with train_ensemble"
            )
        e = int(n_members)
        td = self.static.time_dependent
        has_obs = self.obs_data is not None
        if weight is None:
            weight = (1.0, 1.0) + ((1.0,) if td else ()) + ((1.0,) if has_obs else ())
        w_full = list(float(w) for w in weight) + [0.0] * (4 - len(weight))
        if not td:
            w_full = [w_full[0], w_full[1], 0.0, w_full[2]]

        fused = self._fused_residual_hook(matmul_precision) if batch_num == 1 else None
        # device-count-invariant batching: see _train_epochs_impl
        quad_h = pad_quad(self.fixed.quad,
                          int(batch_num) if batch_num > 1 else self.n_shards)
        if fused is not None and self.source_fn is not None:
            # Inverse-source mode on the fused kernel (see _train_impl):
            # the kernel integrates with the fixed source zeroed; the
            # linear -sum_q w N s_phi term is added XLA-side.
            quad_h = quad_h._replace(src=np.zeros_like(quad_h.src))
        bc_h = pad_points(self.fixed.bc, self.n_shards)
        ic_h = None if self.fixed.ic is None else pad_points(self.fixed.ic, self.n_shards)
        obs_h = None if not has_obs else pad_points(self.obs_data, self.n_shards)
        neu_h = self._padded_neu()
        if batch_num > 1:
            quad_h = _tree_reshape_batches(quad_h, batch_num)
            quad_h = _pad_batched_axis1(quad_h, self.n_shards)
        # hard tables are built at the (flattened) final coords, then
        # reshaped to the mini-batch layout inside _shard_hard
        flat_coords = (quad_h.coords.reshape((-1,) + quad_h.coords.shape[2:])
                       if batch_num > 1 else quad_h.coords)
        hard_hq = (None if self.hard is None
                   else self.hard.tables(flat_coords))
        hard_d = self._shard_hard(quad_h, obs_h, neu_h, batch_num=batch_num,
                                  hq=hard_hq)
        if batch_num > 1:
            quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype, batched=True)
        else:
            quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype)
        bc_d = shard_points(bc_h, self.mesh, dtype=self.dtype)
        ic_d = None if ic_h is None else shard_points(ic_h, self.mesh, dtype=self.dtype)
        obs_d = None if obs_h is None else shard_points(obs_h, self.mesh, dtype=self.dtype)
        neu_d = self._shard_neu(neu_h)

        loss_kwargs = {}
        if fused is not None:
            loss_kwargs["fused_residual"] = fused
        elif self._value_and_jac_default is not None:
            loss_kwargs["value_and_jac"] = self._value_and_jac_default
        if self._apply_override is not None:
            loss_kwargs["apply_fn"] = self._apply_override
        base_loss = make_loss_fn(
            self.static,
            activation=self.activation,
            input_scaling=self.input_scaling,
            source_fn=self.source_fn,
            has_obs=has_obs,
            n_obs_real=0 if not has_obs else int(self.obs_data.mask.sum()),
            normalize_residual=normalize_residual,
            has_react=self.has_react,
            nl_vec=self.nl_vec,
            diff_fn=self.diff_fn,
            vel_fn=self.vel_fn,
            flux_value_and_jac=self._value_and_jac_default,
            hard_mode=self.hard is not None,
            **loss_kwargs,
        )

        def ens_loss(theta_s, quad, bc, ic, obs, weights, prepared=None,
                     neu=None, hard=None):
            # hard-BC tables are member-independent: vmap/map close over
            # them as constants
            member = lambda th: base_loss(th, quad, bc, ic, obs, weights,
                                          prepared, neu, hard)[0]
            if fused is not None:
                # Sequential over members: a Pallas call has no vmap
                # batching rule, and the fused kernel keeps activations
                # in VMEM so memory stays per-member.
                totals = jax.lax.map(member, theta_s)
            else:
                totals = jax.vmap(member)(theta_s)
            # sum over members: gradients stay per-member independent
            return jnp.sum(totals), {"member_loss": totals}

        keys = jax.random.split(jax.random.PRNGKey(self.seed), e)
        members = [self._init_theta(k) for k in keys]
        theta_s = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x, self.dtype) for x in xs]),
            *members,
        )
        theta_s = replicate(theta_s, self.mesh)
        optimizer = make_optimizer(self.optimizer_cfg)
        opt_state = replicate(optimizer.init(theta_s), self.mesh)
        step_fn = make_train_step(
            ens_loss, optimizer, mesh=self.mesh, batch_num=batch_num,
            tables_per_node=self._per_node_tables,
            hard_present=hard_d is not None,
        )
        prepared_d = None
        if fused is not None and self.dtype == jnp.float32:
            prepared_d = self._prepare_fused_layout(quad_h, matmul_precision,
                                                    hard_hq=hard_hq)
        weights_arr = jnp.asarray(w_full, dtype=self.dtype)

        def unstack(theta_host):
            return [
                jax.tree_util.tree_map(lambda a: a[i], theta_host)
                for i in range(e)
            ]

        result = EnsembleResult(n_members=e)
        n_real_quad = self.static.n_test * self.static.n_quad_per_test
        t_start = None
        timed_epochs = 0
        report_overhead = 0.0
        with matmul_precision_scope(matmul_precision):
            for epoch in range(1, int(epoch_num) + 1):
                theta_s, opt_state, aux = step_fn(
                    theta_s, opt_state, quad_d, bc_d, ic_d, obs_d,
                    weights_arr, prepared_d, neu_d, hard_d,
                )
                if t_start is None:
                    jax.block_until_ready(aux["member_loss"])
                    t_start = time.perf_counter()
                else:
                    timed_epochs += 1
                if epoch % int(save_freq) == 0 or epoch == int(epoch_num):
                    jax.block_until_ready(aux["member_loss"])
                    t_rep = time.perf_counter()
                    losses = [float(v) for v in jax.device_get(aux["member_loss"])]
                    errs = [
                        self.compute_error(th, disc=error_disc,
                                           n_times=error_times)
                        for th in unstack(jax.device_get(theta_s))
                    ]
                    elapsed = time.perf_counter() - t_start
                    result.epochs.append(epoch)
                    result.member_losses.append(losses)
                    result.member_errors.append(
                        [float("nan") if v is None else float(v) for v in errs]
                    )
                    result.wall_times.append(elapsed)
                    if verbose:
                        lo = int(np.argmin(losses))
                        err_s = (
                            "n/a" if errs[0] is None else
                            f"best {np.nanmin(result.member_errors[-1]):.3e}"
                            f" / worst {np.nanmax(result.member_errors[-1]):.3e}"
                        )
                        print(
                            f"[varnet/ens] epoch {epoch:7d}  loss "
                            f"[{min(losses):.4e} .. {max(losses):.4e}] "
                            f"(member {lo} lowest)  relL2 {err_s}  "
                            f"({elapsed:.1f}s)"
                        )
                    report_overhead += time.perf_counter() - t_rep

        jax.block_until_ready(theta_s)
        total_time = (
            time.perf_counter() - t_start - report_overhead if t_start else 0.0
        )
        result.steps_per_sec = (
            timed_epochs * batch_num / total_time if total_time > 0 else 0.0
        )
        result.quad_evals_per_sec = (
            timed_epochs * e * n_real_quad / total_time if total_time > 0
            else 0.0
        )

        final_errs = result.member_errors[-1] if result.member_errors else []
        use_error = select == "error" and final_errs and not all(
            np.isnan(v) for v in final_errs
        )
        if use_error:
            best = int(np.nanargmin(final_errs))
            result.best_error = float(final_errs[best])
        else:
            best = int(np.argmin(result.member_losses[-1]))
            if final_errs and not np.isnan(final_errs[best]):
                result.best_error = float(final_errs[best])
        result.best_member = best
        theta_host = jax.device_get(theta_s)
        self.theta = unstack(theta_host)[best]
        self.opt_state = None  # stacked state doesn't transfer to train()
        self._ensemble_thetas = theta_host
        if verbose:
            print(
                f"[varnet/ens] selected member {best}"
                + ("" if result.best_error is None
                   else f" (relL2 {result.best_error:.3e})")
            )
        return result

    # ------------------------------------------------------------------ #
    # adaptive test-space refinement (beyond-reference; fem/adaptive.py)

    def test_residuals(self, theta=None, chunk: int = 16384,
                       matmul_precision: Optional[str] = None) -> np.ndarray:
        """Per-test-function weak-residual densities r_k -> [n_test].

        The same support-volume-normalized residual the (default) training
        loss squares and sums (train/loss.py ``normalize_residual``), so
        ``sum(r**2) / n_test == loss_int``.  Evaluated in chunks over the
        test functions through the XLA value-and-jacobian path (a one-shot
        diagnostic, not a hot loop).  ``theta`` defaults to the current
        parameters.  This is both the adaptive-refinement indicator
        (``refine_tests``) and a public diagnostic surface.
        """
        return self._residual_densities(
            self.fixed.quad, self.static.n_test, theta, chunk,
            matmul_precision)

    def _residual_densities(self, quad, k_real, theta, chunk,
                            matmul_precision):
        """test_residuals body against an ARBITRARY quadrature layout
        (the train mesh's, or a finer probe mesh's — residual_adequacy).
        Densities are support-volume normalized, hence comparable across
        test-mesh scales."""
        from .models.mlp import make_input_scaling, mlp_value_and_jac
        from .ops.residual import weak_residual

        theta = self.theta if theta is None else theta
        d = self.static.n_space
        td = self.static.time_dependent
        n_in = self.static.n_inputs
        has_react = self.has_react
        nl_vec = (None if self.nl_vec is None
                  else jnp.asarray(self.nl_vec, jnp.float32))
        need_u = has_react or nl_vec is not None
        source_fn = self.source_fn
        diff_fn = self.diff_fn
        vel_fn = self.vel_fn
        vj = self._value_and_jac_default or mlp_value_and_jac
        if self.input_scaling:
            scale, shift = make_input_scaling(
                self.static.input_lo, self.static.input_hi
            )
        else:
            scale = shift = None
        activation = self.activation

        hard = self.hard

        @jax.jit
        def chunk_fn(theta_c, coords, n_tbl, dn_tbl, w_tbl, kappa, vel,
                     src, react, hq=None):
            net = (theta_c["net"]
                   if isinstance(theta_c, dict) and "net" in theta_c
                   else theta_c)
            c, nq = coords.shape[0], coords.shape[1]
            flat = coords.reshape(c * nq, n_in)
            u, du = vj(net, flat, activation, scale, shift)
            grad_u = du[:, :d].reshape(c, nq, d)
            u_t = du[:, d].reshape(c, nq) if td else None
            if hard is not None:
                from .fem.hardbc import hard_transform

                u_h, grad_u, u_t = hard_transform(
                    u.reshape(c, nq), grad_u, u_t, hq
                )
                u = u_h.reshape(c * nq)
            if source_fn is not None:
                t_flat = flat[:, d] if td else None
                src = source_fn(
                    theta_c["src"], flat[:, :d], t_flat
                ).reshape(c, nq)
            u_q = u.reshape(c, nq) if need_u else None
            if diff_fn is not None:
                t_flat = flat[:, d] if td else None
                kappa = diff_fn(
                    theta_c["kap"], flat[:, :d], t_flat
                ).reshape(c, nq)
            if vel_fn is not None:
                t_flat = flat[:, d] if td else None
                vel = vel_fn(
                    theta_c["vel"], flat[:, :d], t_flat
                ).reshape(c, nq, d)
            r = weak_residual(
                grad_u, n_tbl, dn_tbl, w_tbl, kappa, vel, src, u_t,
                u=u_q, react=react if has_react else None, nl_vec=nl_vec,
            )
            vol = (jnp.sum(w_tbl, axis=-1) if w_tbl.ndim == 2
                   else jnp.sum(w_tbl))
            return r / vol

        per_node = quad.tables_per_node
        chunk = max(1, min(int(chunk), k_real))
        out = np.empty(k_real, dtype=np.float64)
        with matmul_precision_scope(matmul_precision or "highest"):
            for lo in range(0, k_real, chunk):
                hi = min(lo + chunk, k_real)
                sl = slice(lo, hi)
                # pad the tail chunk so every call shares one jit cache
                pad = chunk - (hi - lo)

                def take(a, tbl=False):
                    a = np.asarray(a)
                    if tbl and not per_node:
                        return a
                    a = a[sl]
                    if pad:
                        a = np.concatenate(
                            [a, np.repeat(a[-1:], pad, axis=0)], axis=0
                        )
                    return a

                coords_c = take(quad.coords).astype(np.float32)
                hq = None
                if hard is not None:
                    hq = jax.tree_util.tree_map(
                        lambda a: np.asarray(a, np.float32),
                        hard.tables(coords_c),
                    )
                r = chunk_fn(
                    theta,
                    coords_c,
                    take(quad.N, tbl=True), take(quad.dN, tbl=True),
                    take(quad.w, tbl=True), take(quad.kappa),
                    take(quad.vel), take(quad.src), take(quad.react),
                    hq,
                )
                out[sl] = np.asarray(r)[: hi - lo]
        return out

    def residual_adequacy(self, theta=None, refine: int = 2,
                          integ_p_num: Optional[int] = None,
                          threshold: float = 10.0, chunk: int = 16384,
                          probe_n: Optional[int] = None,
                          probe_seed: int = 0,
                          matmul_precision: Optional[str] = None,
                          verbose: bool = True) -> dict:
        """Guard against residual-consistent WRONG solutions (VERDICT r3
        item 2; SURVEY.md §0 items 3-4 — the weak residual is the
        method's only training signal, so a test space too coarse for
        the hypothesis space can be driven to ~0 while the solution gets
        WORSE; measured on the obstacle case, where ff128/width-96 drove
        the interior loss 1000x down to rel-L2 88%).

        Re-scores the weak residual densities on an INDEPENDENT probe
        test mesh ``refine``x finer per dimension (space and time; same
        support-volume normalization, so densities are comparable across
        scales).  For a genuinely converged solution the probe sees the
        same small residual field (ratio ~ 1); quadrature/test-space
        underdetermination shows up as probe >> train.

        Returns dict with ``train_rms``, ``probe_rms``, ``ratio``,
        ``flagged`` (ratio > threshold), plus the probe mesh spec.  A
        one-shot host-side diagnostic (XLA value+jac path) — not part of
        any train step.

        ``probe_n`` caps the probe at a uniform random subset of that
        many test classes (deterministic in ``probe_seed``).  The RMS
        ratio needs thousands of classes, not millions: the full probe's
        host-side table assembly cost ~45 min on the refined ~300k-class
        obstacle space (which forced the per-round audit to opt-in,
        round 4), while a 16k-class subsample is seconds-to-minutes at
        an RMS within sampling noise of the full probe (pinned in
        tests/test_adequacy.py and calibrated on the obstacle thetas in
        benchmarks/adequacy_check.py).
        """
        f = int(refine)
        if f < 2:
            raise ValueError("refine must be >= 2 (an identical probe "
                             "mesh cannot detect underdetermination)")
        disc = self.disc_num
        probe_disc = ([int(d) * f for d in disc]
                      if np.ndim(disc) else int(disc) * f)
        probe_t = (None if self.t_disc_num is None
                   else int(self.t_disc_num) * f)
        probe_fixed = build_fixed_data(
            self.pde, probe_disc, b_disc_num=self.b_disc_num,
            t_disc_num=probe_t,
            integ_p_num=int(integ_p_num or self.integ_p_num),
            pad_multiple=1, test_order=self.test_order,
            max_test=probe_n, subsample_seed=probe_seed,
        )
        r_train = self.test_residuals(theta, chunk=chunk,
                                      matmul_precision=matmul_precision)
        r_probe = self._residual_densities(
            probe_fixed.quad, probe_fixed.static.n_test, theta, chunk,
            matmul_precision)
        train_rms = float(np.sqrt(np.mean(r_train**2)))
        probe_rms = float(np.sqrt(np.mean(r_probe**2)))
        ratio = probe_rms / max(train_rms, 1e-300)
        out = {
            "train_rms": train_rms,
            "probe_rms": probe_rms,
            "ratio": ratio,
            "flagged": bool(ratio > threshold),
            "threshold": float(threshold),
            "train_mesh": f"disc={disc} tdisc={self.t_disc_num} "
                          f"n_test={self.static.n_test}",
            "probe_mesh": f"disc={probe_disc} tdisc={probe_t} "
                          f"n_test={probe_fixed.static.n_test}",
            "probe_n": probe_n,
        }
        if verbose:
            state = ("FLAGGED: probe residual >> train residual — the "
                     "train test space likely underdetermines the "
                     "solution (aliasing); densify disc/t_disc/integ or "
                     "refine_tests before trusting the fit"
                     if out["flagged"] else "ok")
            print(f"[varnet/adequacy] train_rms {train_rms:.3e}  "
                  f"probe_rms {probe_rms:.3e}  ratio {ratio:.1f}  "
                  f"{state}", flush=True)
        return out

    def refine_tests(self, frac: float = 0.1,
                     threshold: Optional[float] = None, factor: int = 2,
                     theta=None, verbose: bool = True) -> dict:
        """Residual-driven adaptive refinement of the hat test space
        (beyond-reference — fem/adaptive.py).

        Flags the test functions whose |residual density| is in the top
        ``frac`` quantile (or >= ``threshold`` when given) and enriches
        the test space with the factor-times-finer hats inside their
        supports, then subsequent ``train``/``refine_lm``/... calls see
        the enlarged problem.  Typical staged use::

            vn.train(epoch_num=5000, ...)
            vn.refine_tests(frac=0.15)      # densify where r is largest
            vn.train(epoch_num=5000, ...)   # recompiles on the new shape

        The refined quad carries per-node tables, so the plain fused
        residual kernel is ineligible afterwards (the precoeff fused
        variant and the value+jacobian kernel still apply — hot-path
        notes in CLAUDE.md).  Refinement state is recovered from the
        quadrature coordinates themselves; to reproduce a refined run
        from a checkpoint, replay the same refine_tests calls.
        """
        from .fem.adaptive import refine_fixed

        r = self.test_residuals(theta)
        a = np.abs(r)
        if threshold is None:
            if not 0.0 < float(frac) <= 1.0:
                raise ValueError("frac must be in (0, 1]")
            threshold = float(np.quantile(a, 1.0 - float(frac)))
        flags = a >= threshold
        self.fixed, info = refine_fixed(
            self.pde, self.fixed, flags, self.integ_p_num, factor=factor,
        )
        self.static = self.fixed.static
        info["threshold"] = float(threshold)
        if verbose:
            print(
                f"[varnet/adapt] flagged {info['n_flagged']}"
                f" (|r| >= {threshold:.3e}), added {info['n_added']}"
                f" finer hats -> n_test {info['n_test']}"
            )
        return info

    def train_adaptive(
        self,
        epoch_num: int,
        rounds: int = 2,
        frac: float = 0.2,
        factor: int = 2,
        weight: Optional[Sequence[float]] = None,
        folderpath: Optional[str] = None,
        verbose: bool = True,
        **train_kwargs,
    ) -> TrainResult:
        """Alternating train / refine_tests schedule (fem/adaptive.py).

        Splits ``epoch_num`` over ``rounds + 1`` training stages with a
        residual-driven refinement between consecutive stages, and
        returns the merged history (epochs offset per stage; the
        per-stage refinement info rides the loss record at the stage
        boundary).  With ``folderpath``, each stage checkpoints into its
        own ``stage<K>/`` subfolder — refinement changes the problem
        shape, so stages are distinct checkpoint lineages.
        """
        stages = int(rounds) + 1
        per = max(1, int(epoch_num) // stages)
        merged = TrainResult()
        offset = 0
        for s in range(stages):
            fp = (None if folderpath is None
                  else os.path.join(folderpath, f"stage{s}"))
            res = self.train(epoch_num=per, weight=weight, folderpath=fp,
                             verbose=verbose, **train_kwargs)
            merged.epochs.extend(e + offset for e in res.epochs)
            merged.losses.extend(res.losses)
            merged.errors.extend(res.errors)
            last_wall = merged.wall_times[-1] if merged.wall_times else 0.0
            merged.wall_times.extend(w + last_wall for w in res.wall_times)
            merged.total_steps += res.total_steps
            merged.quad_evals_per_sec = res.quad_evals_per_sec
            merged.steps_per_sec = res.steps_per_sec
            offset += per
            if s < stages - 1:
                info = self.refine_tests(frac=frac, factor=factor,
                                         verbose=verbose)
                if merged.losses:
                    merged.losses[-1] = dict(
                        merged.losses[-1],
                        refined=info["n_added"], n_test=info["n_test"],
                    )
        self.train_result = merged
        return merged

    def refine_lbfgs(
        self,
        steps: int = 500,
        weight: Optional[Sequence[float]] = None,
        save_freq: int = 100,
        verbose: bool = True,
        error_disc: int = 64,
        error_times: int = 5,
        memory_size: int = 20,
        target_error: Optional[float] = None,
        matmul_precision: Optional[str] = "highest",
        normalize_residual: bool = True,
    ) -> TrainResult:
        """L-BFGS polish phase after Adam (full-batch, zoom linesearch).

        The standard second-stage optimizer for variational/PINN losses:
        Adam finds the basin, L-BFGS drives the residual orders of
        magnitude further.  Beyond-reference capability (the TF1 reference
        had Adam/RMSProp only — SURVEY.md §2.1 #2).  Uses XLA auto
        sharding (the linesearch's internal while_loop makes the explicit
        one-psum pattern inapplicable); on a TPU pod the extra collectives
        ride ICI.

        Caveat (measured): start it from a MID-converged Adam state.  From
        a deeply-converged state (loss near the f32 linesearch resolution,
        ~1e-6) the zoom linesearch cannot certify descent and stalls; a
        deep Adam decay schedule is the better final-decade tool there
        (DESIGN.md).
        """
        with matmul_precision_scope(matmul_precision):
            return self._refine_lbfgs_impl(
                steps, weight, save_freq, verbose, error_disc, error_times,
                memory_size, target_error, matmul_precision,
                normalize_residual,
            )

    def _refine_lbfgs_impl(
        self, steps, weight, save_freq, verbose, error_disc, error_times,
        memory_size, target_error, matmul_precision, normalize_residual,
    ) -> TrainResult:
        import optax

        td = self.static.time_dependent
        has_obs = self.obs_data is not None
        if weight is None:
            weight = (1.0, 1.0) + ((1.0,) if td else ()) + ((1.0,) if has_obs else ())
        w_full = list(weight) + [0.0] * (4 - len(weight))
        if not td:
            w_full = [w_full[0], w_full[1], 0.0, w_full[2]]
        weights_arr = jnp.asarray(w_full, dtype=self.dtype)

        quad_h = pad_quad(self.fixed.quad, self.n_shards)
        bc_h = pad_points(self.fixed.bc, self.n_shards)
        ic_h = None if self.fixed.ic is None else pad_points(self.fixed.ic, self.n_shards)
        obs_h = None if not has_obs else pad_points(self.obs_data, self.n_shards)
        quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype)
        bc_d = shard_points(bc_h, self.mesh, dtype=self.dtype)
        ic_d = None if ic_h is None else shard_points(ic_h, self.mesh, dtype=self.dtype)
        obs_d = None if obs_h is None else shard_points(obs_h, self.mesh, dtype=self.dtype)
        neu_h = self._padded_neu()
        neu_d = self._shard_neu(neu_h)
        hard_d = self._shard_hard(quad_h, obs_h, neu_h)

        loss_kwargs = {}
        if self.use_pallas:
            loss_kwargs["value_and_jac"] = self._pallas_value_and_jac(
                matmul_precision
            )
        elif self._value_and_jac_default is not None:
            loss_kwargs["value_and_jac"] = self._value_and_jac_default
        if self._apply_override is not None:
            loss_kwargs["apply_fn"] = self._apply_override
        loss_fn = make_loss_fn(
            self.static,
            activation=self.activation,
            input_scaling=self.input_scaling,
            source_fn=self.source_fn,
            has_obs=has_obs,
            n_obs_real=0 if not has_obs else int(self.obs_data.mask.sum()),
            normalize_residual=normalize_residual,
            has_react=self.has_react,
            nl_vec=self.nl_vec,
            diff_fn=self.diff_fn,
            vel_fn=self.vel_fn,
            flux_value_and_jac=self._value_and_jac_default,
            hard_mode=self.hard is not None,
            **loss_kwargs,
        )

        def scalar_loss(theta):
            return loss_fn(theta, quad_d, bc_d, ic_d, obs_d, weights_arr,
                           neu=neu_d, hard=hard_d)[0]

        opt = optax.lbfgs(memory_size=memory_size)
        theta = replicate(self.theta, self.mesh)
        state = opt.init(theta)
        value_and_grad = optax.value_and_grad_from_state(scalar_loss)

        @jax.jit
        def lbfgs_step(theta, state):
            value, grad = value_and_grad(theta, state=state)
            updates, state = opt.update(
                grad, state, theta, value=value, grad=grad, value_fn=scalar_loss
            )
            theta = optax.apply_updates(theta, updates)
            return theta, state, value

        result = TrainResult()
        t_start = None
        for it in range(1, int(steps) + 1):
            theta, state, value = lbfgs_step(theta, state)
            if t_start is None:
                jax.block_until_ready(value)
                t_start = time.perf_counter()
            if it % int(save_freq) == 0 or it == int(steps):
                jax.block_until_ready(value)
                err = self.compute_error(theta, disc=error_disc, n_times=error_times)
                result.epochs.append(it)
                result.losses.append({"loss": float(value)})
                result.errors.append(err if err is not None else float("nan"))
                result.wall_times.append(time.perf_counter() - t_start)
                if verbose:
                    err_s = f"{err:.3e}" if err is not None else "n/a"
                    print(
                        f"[varnet/lbfgs] it {it:6d}  loss {float(value):.4e}"
                        f"  relL2 {err_s}  ({result.wall_times[-1]:.1f}s)"
                    )
                if target_error is not None and err is not None and err < target_error:
                    if verbose:
                        print(f"[varnet/lbfgs] target {target_error:.1e} reached")
                    break
        self.theta = jax.device_get(theta)
        result.total_steps = int(steps)
        self.train_result = result
        return result

    def refine_lm(
        self,
        steps: int = 100,
        weight: Optional[Sequence[float]] = None,
        cg_iters: int = 50,
        save_freq: int = 10,
        verbose: bool = True,
        error_disc: int = 64,
        error_times: int = 5,
        lam0: float = 1e-3,
        target_error: Optional[float] = None,
        matmul_precision: Optional[str] = "highest",
        k_chunks: int = 1,
        folderpath: Optional[str] = None,
        cg_segment: int = 0,
        resume: bool = False,
        max_retries: int = 0,
        retry_backoff: float = 30.0,
        precond: int = 0,
        precond_mode: str = "leaf",
    ) -> TrainResult:
        """Levenberg-Marquardt refinement (matrix-free Gauss-Newton + CG).

        precond > 0 enables Jacobi-preconditioned CG: that many Hutchinson
        VJP probes estimate diag(J^T J) once per LM iteration (cost
        ~precond/cg_iters of a step) and CG runs on the diagonally-scaled
        damped system — fewer CG iterations when curvature scales vary
        across layers (see train/gauss_newton.py; 8 is a good default).
        precond_mode='leaf' (default) collapses the estimate to one
        scalar per parameter leaf — the elementwise probe noise was
        measured to DEGRADE final rel-L2 (lm_precond_tpu.json); 'diag'
        keeps the legacy elementwise estimate for A/B.

        The final-decade tool: the variational loss is a nonlinear least
        squares, so GN curvature is available through one jvp + one vjp
        per CG iteration (see train/gauss_newton.py).  On TPU the network
        evaluation rides the fused Pallas kernels: J v through the
        custom-JVP twin, J^T w through the custom-VJP one (JAX allows one
        rule per function, so LM carries both closures).  Start from an
        Adam-trained state.

        Fault recovery (SURVEY.md §5.3 — checkpoint-restart):

        resume:        restore the newest LM checkpoint (theta + the lam
                       damping state from its meta sidecar) from
                       ``folderpath`` and continue toward ``steps`` total
                       iterations.  LM checkpoints are numbered globally
                       across resumed runs, so ``steps`` means the same
                       thing no matter how many restarts it took.
        max_retries:   on a *transient* device fault (UNAVAILABLE /
                       RESOURCE_EXHAUSTED / ... — see train/fault.py),
                       auto-resume from the newest checkpoint up to this
                       many times, doubling ``k_chunks`` each retry to
                       shrink the per-chunk memory footprint.  Program
                       errors still propagate immediately.  A hard-wedged
                       device (hang, not error) cannot be caught
                       in-process — the checkpoints remain valid for a
                       cross-process ``resume=True``.
        retry_backoff: seconds to sleep before each retry.

        LM checkpoints live in the ``lm/`` SUBFOLDER of ``folderpath``
        (so a case folder shared with ``train`` keeps its epoch-numbered
        checkpoints separate from LM's globally-step-numbered ones, and
        the keep-newest pruning never mixes the two).  A fresh run
        (``resume=False``) clears any previous LM checkpoints there —
        stale steps from an earlier run would otherwise alias into this
        run's global numbering.
        """
        if resume and folderpath is None:
            raise ValueError(
                "resume=True requires folderpath (nothing to resume from)"
            )
        lm_folder = None if folderpath is None else os.path.join(
            folderpath, "lm"
        )
        st = {"steps": int(steps), "lam": float(lam0), "k": int(k_chunks),
              "offset": 0}
        if resume:
            st["offset"], lam_meta = self._restore_theta(lm_folder)
            st["steps"] = int(steps) - st["offset"]
            if lam_meta is not None:
                st["lam"] = float(lam_meta)
            if verbose and st["offset"]:
                print(
                    f"[varnet/lm] resumed from LM step {st['offset']} in "
                    f"{lm_folder} (lam {st['lam']:.1e})"
                )
            if st["steps"] <= 0:
                result = TrainResult()
                result.total_steps = int(steps)
                return result
        elif lm_folder is not None and list_checkpoint_steps(lm_folder):
            import shutil

            shutil.rmtree(lm_folder)
            if verbose:
                print(
                    f"[varnet/lm] cleared stale LM checkpoints in "
                    f"{lm_folder} (fresh run; pass resume=True to continue"
                    " them instead)"
                )

        def attempt_fn():
            with matmul_precision_scope(matmul_precision):
                return self._refine_lm_impl(
                    st["steps"], weight, cg_iters, save_freq, verbose,
                    error_disc, error_times, st["lam"], target_error,
                    matmul_precision, st["k"], lm_folder, cg_segment,
                    step_offset=st["offset"], precond=precond,
                    precond_mode=precond_mode,
                )

        def on_fault(_attempt):
            if lm_folder is not None:
                st["offset"], lam_meta = self._restore_theta(lm_folder)
                if lam_meta is not None:
                    st["lam"] = float(lam_meta)
            st["steps"] = int(steps) - st["offset"]
            if st["steps"] <= 0:
                # faulted after the final checkpoint: the work is done
                result = TrainResult()
                result.total_steps = int(steps)
                return result
            st["k"] *= 2
            return (
                f"resuming from LM step {st['offset']} with k_chunks "
                f"{st['k']}, lam {st['lam']:.1e}"
            )

        return self._retry_transient(
            attempt_fn, on_fault, max_retries, retry_backoff, verbose,
            label="/lm", include_oom=True,
        )

    def _restore_theta(self, folderpath):
        """Load the newest checkpoint's theta into ``self.theta``.

        Returns ``(step, lam)`` — the checkpoint's step number (0 if the
        folder holds none) and the lam damping value from its meta
        sidecar (None if absent, e.g. a checkpoint written by ``train``).
        Used by the LM resume/retry path and by ``train_causal``'s
        completed-stage skip; the params-only restore is deliberate here,
        so the optimizer-state-mismatch warning is suppressed.
        """
        import warnings

        try:
            with warnings.catch_warnings():
                warnings.filterwarnings(
                    "ignore", message="stored optimizer state"
                )
                state, step = load_checkpoint(
                    folderpath, {"theta": jax.device_get(self.theta)}
                )
        except FileNotFoundError:
            return 0, None
        self.theta = state["theta"]
        meta = load_meta(folderpath, step)
        lam = None if meta is None else meta.get("lam")
        return int(step), lam

    def _refine_lm_impl(
        self, steps, weight, cg_iters, save_freq, verbose, error_disc,
        error_times, lam0, target_error, matmul_precision, k_chunks,
        folderpath, cg_segment, step_offset=0, precond=0,
        precond_mode="leaf",
    ) -> TrainResult:
        from jax.flatten_util import ravel_pytree

        from .train.gauss_newton import LMState, make_lm_step, make_residual_fn

        td = self.static.time_dependent
        has_obs = self.obs_data is not None
        if weight is None:
            weight = (1.0, 1.0) + ((1.0,) if td else ()) + ((1.0,) if has_obs else ())
        w_full = list(weight) + [0.0] * (4 - len(weight))
        if not td:
            w_full = [w_full[0], w_full[1], 0.0, w_full[2]]
        weights_arr = jnp.asarray(w_full, dtype=self.dtype)

        quad_h = pad_quad(self.fixed.quad, self.n_shards * int(k_chunks))
        bc_h = pad_points(self.fixed.bc, self.n_shards)
        ic_h = None if self.fixed.ic is None else pad_points(self.fixed.ic, self.n_shards)
        obs_h = None if not has_obs else pad_points(self.obs_data, self.n_shards)
        quad_d = shard_quad(quad_h, self.mesh, dtype=self.dtype)
        bc_d = shard_points(bc_h, self.mesh, dtype=self.dtype)
        ic_d = None if ic_h is None else shard_points(ic_h, self.mesh, dtype=self.dtype)
        obs_d = None if obs_h is None else shard_points(obs_h, self.mesh, dtype=self.dtype)
        neu_h = self._padded_neu()
        neu_d = self._shard_neu(neu_h)
        hard_d = self._shard_hard(quad_h, obs_h, neu_h)

        res_kwargs = {"k_chunks": int(k_chunks)}
        if self._value_and_jac_default is not None:
            res_kwargs["value_and_jac"] = self._value_and_jac_default
        if self._apply_override is not None:
            res_kwargs["apply_fn"] = self._apply_override
        jvp_kwargs = dict(res_kwargs)
        if self.use_pallas:
            # Fused kernels: the VJP-wrapped one backs J^T w (reverse mode),
            # the JVP-wrapped twin backs J v (forward mode) — JAX allows one
            # differentiation rule per function, hence the pair.  Both have
            # Fourier-embedded variants.
            import functools

            from .ops.pallas_mlp import (
                DEFAULT_TILE,
                _auto_tile_lm,
                pallas_ff_value_and_jac_jvp,
                pallas_value_and_jac_jvp,
            )

            # Under the CG while-loop the kernels' scoped VMEM sits on
            # top of the remat stack — cap the tile below the plain
            # auto-tiler (measured 19.33M/16M OOM at 3-D width 64
            # otherwise; _auto_tile_lm).
            net = (self.theta["net"] if isinstance(self.theta, dict)
                   else self.theta)
            h_eff = max(l["w"].shape[1] for l in net)
            if self.fourier_b is not None:
                h_eff = max(h_eff, 2 * int(self.fourier_b.shape[1]))
            lm_tile = _auto_tile_lm(
                DEFAULT_TILE, h_eff, len(net), self.static.n_inputs
            )
            res_kwargs["value_and_jac"] = self._pallas_value_and_jac(
                matmul_precision, tile=lm_tile
            )
            prec = (
                jax.lax.Precision.HIGHEST
                if matmul_precision in ("highest", "float32")
                else None
            )
            if self.fourier_b is None:
                jvp_kwargs["value_and_jac"] = functools.partial(
                    pallas_value_and_jac_jvp, precision=prec, tile=lm_tile
                )
            else:
                jvp_kwargs["value_and_jac"] = functools.partial(
                    pallas_ff_value_and_jac_jvp, self.fourier_b,
                    precision=prec, tile=lm_tile,
                )
        common = dict(
            activation=self.activation,
            input_scaling=self.input_scaling,
            source_fn=self.source_fn,
            has_obs=has_obs,
            n_obs_real=0 if not has_obs else int(self.obs_data.mask.sum()),
            has_react=self.has_react,
            nl_vec=self.nl_vec,
            diff_fn=self.diff_fn,
            vel_fn=self.vel_fn,
            flux_value_and_jac=self._value_and_jac_default,
            hard_mode=self.hard is not None,
        )
        res_fn = make_residual_fn(self.static, **common, **res_kwargs)
        res_fn_jvp = (
            res_fn
            if jvp_kwargs == res_kwargs
            else make_residual_fn(self.static, **common, **jvp_kwargs)
        )
        theta0 = replicate(self.theta, self.mesh)
        flat0, unravel = ravel_pytree(theta0)

        # Explicit shard_map LM (same design as the Adam step — packed
        # psums over the data axis; see train/gauss_newton.py): the
        # closures take the sharded data pytree and compute the PER-SHARD
        # residual slice.
        def closure(flat, data):
            quad, bc, ic, obs, neu, hard = data
            return res_fn(unravel(flat), quad, bc, ic, obs, weights_arr,
                          neu=neu, hard=hard)

        closure_jvp = None
        if res_fn_jvp is not res_fn:
            def closure_jvp(flat, data):
                quad, bc, ic, obs, neu, hard = data
                return res_fn_jvp(unravel(flat), quad, bc, ic, obs,
                                  weights_arr, neu=neu, hard=hard)

        from jax.sharding import PartitionSpec as P

        from .fem.assembly import QuadData
        from .parallel.mesh import DATA_AXIS

        rep = P()
        per_node = P(DATA_AXIS)
        # order-2 test space carries per-node [K, nQ] tables: shard them
        tbl = per_node if self._per_node_tables else rep
        quad_spec = QuadData(
            coords=per_node, N=tbl, dN=tbl, w=tbl,
            kappa=per_node, vel=per_node, src=per_node, react=per_node,
            mask=per_node,
        )
        data = (quad_d, bc_d, ic_d, obs_d, neu_d, hard_d)
        data_specs = (quad_spec, per_node, per_node, per_node, per_node,
                      per_node)

        # flat-index -> leaf-id map for the per-leaf preconditioner
        # (matches ravel_pytree's leaf order)
        leaf_sizes = [int(np.size(leaf))
                      for leaf in jax.tree_util.tree_leaves(theta0)]
        leaf_segments = np.repeat(np.arange(len(leaf_sizes)), leaf_sizes)
        lm_step = make_lm_step(
            closure, cg_iters=cg_iters, cg_segment=cg_segment,
            residual_jvp=closure_jvp, mesh=self.mesh, data=data,
            data_specs=data_specs, precond=precond,
            leaf_segments=leaf_segments, precond_mode=precond_mode,
        )
        r0 = closure(flat0, data)
        state = LMState(
            flat=flat0,
            lam=jnp.asarray(float(lam0), self.dtype),
            loss=jnp.dot(r0, r0),
        )

        result = TrainResult()
        t_start = None
        for it in range(1, int(steps) + 1):
            state = lm_step(state)
            if t_start is None:
                jax.block_until_ready(state.loss)
                t_start = time.perf_counter()
            if it % int(save_freq) == 0 or it == int(steps):
                jax.block_until_ready(state.loss)
                theta_now = unravel(state.flat)
                err = self.compute_error(
                    jax.device_get(theta_now), disc=error_disc, n_times=error_times
                )
                it_g = int(step_offset) + it
                result.epochs.append(it_g)
                result.losses.append(
                    {"loss": float(state.loss), "lam": float(state.lam)}
                )
                result.errors.append(err if err is not None else float("nan"))
                result.wall_times.append(time.perf_counter() - t_start)
                if verbose:
                    err_s = f"{err:.3e}" if err is not None else "n/a"
                    print(
                        f"[varnet/lm] it {it_g:5d}  loss {float(state.loss):.4e}"
                        f"  lam {float(state.lam):.1e}  relL2 {err_s}"
                        f"  ({result.wall_times[-1]:.1f}s)"
                    )
                if folderpath is not None:
                    save_checkpoint(
                        folderpath, it_g,
                        {"theta": jax.device_get(theta_now)},
                        config=self.config_dict(),
                    )
                    # lam in the sidecar makes checkpoint-restart exact:
                    # a resumed run re-enters with the damping state it
                    # faulted at, not a cold lam0 re-warm.
                    save_meta(
                        folderpath, it_g,
                        {"lam": float(state.lam), "loss": float(state.loss),
                         "phase": "lm"},
                    )
                if target_error is not None and err is not None and err < target_error:
                    if verbose:
                        print(f"[varnet/lm] target {target_error:.1e} reached")
                    break
        self.theta = jax.device_get(unravel(state.flat))
        result.total_steps = int(step_offset) + int(steps)
        self.train_result = result
        return result

    # ------------------------------------------------------------------ #
    # evaluation / reporting

    def evaluate(
        self,
        x: np.ndarray,
        t: Optional[np.ndarray] = None,
        mu: Optional[np.ndarray] = None,
        theta: Any = None,
        chunk: int = 1 << 20,
        matmul_precision: Optional[str] = "highest",
    ) -> np.ndarray:
        """u_theta at points (reference ``VarNet.evaluate``).

        x: [P, d]; t: scalar or [P] (time-dependent problems);
        mu: [P, n_mor] or [n_mor] (parametric problems).
        Large point sets are evaluated in padded fixed-size chunks so
        arbitrarily fine evaluation grids never exhaust device memory (and
        at most two program shapes are compiled).

        matmul_precision defaults to 'highest': the TPU MXU's bf16 default
        adds ~5e-3 relative noise — enough to hide a 1e-3-level solution
        entirely (measured on config 5: a 3.3e-4 solution scored 3.0e-3
        through a bf16 evaluation).  Pass None to inherit the ambient
        precision.
        """
        with matmul_precision_scope(matmul_precision):
            return self._evaluate_inner(x, t, mu, theta, chunk)

    def evaluate_field(
        self,
        which: str,
        x: np.ndarray,
        t: Optional[np.ndarray] = None,
        theta: Any = None,
    ) -> np.ndarray:
        """Evaluate a RECOVERED trainable coefficient field at points
        (inverse problems — DESIGN.md decision 17).

        which: 'source' | 'kappa' | 'vel' — requires the matching
        source_fn/diff_fn/vel_fn hook.  x: [P, d]; t: scalar or [P]
        (time-dependent problems).  Returns [P] (source/kappa) or
        [P, d] (vel).
        """
        import jax.numpy as jnp

        fn, leaf = {
            "source": (self.source_fn, "src"),
            "kappa": (self.diff_fn, "kap"),
            "vel": (self.vel_fn, "vel"),
        }[which]
        if fn is None:
            raise ValueError(
                f"evaluate_field('{which}') requires the corresponding "
                "trainable hook (source_fn/diff_fn/vel_fn)"
            )
        theta = self.theta if theta is None else theta
        x = np.atleast_2d(np.asarray(x, np.float32))
        t_arr = None
        if self.static.time_dependent and t is not None:
            t_arr = jnp.asarray(np.broadcast_to(
                np.asarray(t, np.float32), (x.shape[0],)))
        return np.asarray(fn(theta[leaf], jnp.asarray(x), t_arr))

    def evaluate_ensemble(
        self,
        x: np.ndarray,
        t: Optional[np.ndarray] = None,
        mu: Optional[np.ndarray] = None,
        thetas: Any = None,
        chunk: int = 1 << 20,
        matmul_precision: Optional[str] = "highest",
        return_members: bool = False,
    ):
        """Ensemble mean and spread of u at points (beyond-reference).

        Evaluates every member of the last :meth:`train_ensemble` run
        (or a stacked ``thetas`` pytree with a leading member axis) and
        returns ``(mean [P], std [P])`` — the std is the seed-variance
        band, a cheap epistemic-uncertainty proxy.  Conventions match
        :meth:`evaluate`.  ``return_members=True`` appends the raw
        ``[E, P]`` member matrix.
        """
        thetas = self._ensemble_thetas if thetas is None else thetas
        if thetas is None:
            raise ValueError(
                "no ensemble available: run train_ensemble first or pass "
                "a stacked thetas pytree"
            )
        e = jax.tree_util.tree_leaves(thetas)[0].shape[0]
        members = np.stack([
            self.evaluate(
                x, t=t, mu=mu, chunk=chunk,
                matmul_precision=matmul_precision,
                theta=jax.tree_util.tree_map(lambda a: a[i], thetas),
            )
            for i in range(e)
        ])
        mean, std = members.mean(axis=0), members.std(axis=0)
        if return_members:
            return mean, std, members
        return mean, std

    def evaluate_grad(
        self,
        x: np.ndarray,
        t: Optional[np.ndarray] = None,
        mu: Optional[np.ndarray] = None,
        theta: Any = None,
        matmul_precision: Optional[str] = "highest",
    ) -> Dict[str, np.ndarray]:
        """u and its input derivatives at points (beyond-reference: users
        need fluxes kappa grad u, not just u).

        Returns ``{"u": [P], "grad": [P, d]}`` plus ``"u_t": [P]`` for
        time-dependent problems.  Conventions match :meth:`evaluate`; the
        jacobian comes from the model-consistent forward-mode chain (the
        same path the Neumann flux penalty uses)."""
        from .models.mlp import make_input_scaling, mlp_value_and_jac

        coords = self._make_coords(x, t, mu)
        theta = self.theta if theta is None else theta
        net = theta["net"] if isinstance(theta, dict) and "net" in theta else theta

        fn = getattr(self, "_grad_eval_fn", None)
        if fn is None:
            vj = self._value_and_jac_default or mlp_value_and_jac
            if self.input_scaling:
                scale, shift = make_input_scaling(
                    self.static.input_lo, self.static.input_hi
                )
            else:
                scale = shift = None
            act = self.activation

            def _call(p, flat):
                return vj(p, flat, act, scale, shift)

            fn = jax.jit(_call)
            self._grad_eval_fn = fn

        d = self.static.n_space
        with matmul_precision_scope(matmul_precision):
            u, du = fn(self._replicated(net), jnp.asarray(coords, self.dtype))
        u = np.asarray(jax.device_get(u), dtype=np.float64)
        du = np.asarray(jax.device_get(du), dtype=np.float64)
        grad, u_t = du[:, :d], (du[:, d] if self.static.time_dependent else None)
        if self.hard is not None:
            from .fem.hardbc import hard_transform

            hq = self.hard.tables(coords)
            u, grad, u_t = jax.tree_util.tree_map(
                np.asarray, hard_transform(u, grad, u_t, hq)
            )
        out = {"u": u, "grad": grad}
        if self.static.time_dependent:
            out["u_t"] = u_t
        return out

    def _replicated(self, theta):
        """Replicate theta onto the mesh, cached by LEAF identity —
        error reports and chunked evaluation call this once per time
        slice/chunk with the SAME host pytree (VERDICT r2 hygiene).

        The key is the tuple of leaf ids, so replacing any leaf (the
        common 'vn.theta[0]["w"] = new' pattern) invalidates the cache;
        mutating an ndarray's CONTENTS in place (arr[...] = new) cannot
        be detected without hashing the data — rebind the leaf instead.
        """
        key = tuple(id(l) for l in jax.tree_util.tree_leaves(theta))
        cached = getattr(self, "_theta_d_cache", None)
        if cached is not None and cached[1] == key:
            return cached[2]
        theta_d = replicate(theta, self.mesh)
        # keep the host pytree alive so its leaf ids cannot be recycled
        self._theta_d_cache = (theta, key, theta_d)
        return theta_d

    def _hard_combine(self, coords: np.ndarray, u: np.ndarray) -> np.ndarray:
        """Apply the exact-BC ansatz to raw network outputs, host-side f64
        (the transform fields involve user callables — untraceable; the
        training path uses precomputed device tables instead)."""
        A, B = self.hard.value_AB(coords)
        return A + B * u

    def _evaluate_inner(self, x, t, mu, theta, chunk) -> np.ndarray:
        theta = self.theta if theta is None else theta
        coords = self._make_coords(x, t, mu)
        n = coords.shape[0]
        theta_d = self._replicated(theta)
        if n <= chunk:
            out = self._eval_fn(theta_d, jnp.asarray(coords, self.dtype))
            u = np.asarray(jax.device_get(out), dtype=np.float64)
            return u if self.hard is None else self._hard_combine(coords, u)
        outs = []
        for s in range(0, n, chunk):
            block = coords[s : s + chunk]
            real = block.shape[0]
            if real < chunk:
                block = np.concatenate([block, block[-1:].repeat(chunk - real, 0)])
            o = self._eval_fn(theta_d, jnp.asarray(block, self.dtype))
            outs.append(np.asarray(jax.device_get(o), dtype=np.float64)[:real])
        u = np.concatenate(outs)
        return u if self.hard is None else self._hard_combine(coords, u)

    def _make_coords(self, x, t, mu) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, dtype=np.float64))
        cols = [x]
        if self.static.time_dependent:
            if t is None:
                raise ValueError("time-dependent problem: t required")
            t = np.broadcast_to(np.asarray(t, dtype=np.float64), (x.shape[0],))
            cols.append(t[:, None])
        if self.static.n_mor:
            if mu is None:
                mu = self.pde.mor.samples[0]
            mu = np.asarray(mu, dtype=np.float64)
            if mu.ndim == 1:
                mu = np.broadcast_to(mu[None, :], (x.shape[0], mu.shape[0]))
            cols.append(mu)
        return np.concatenate(cols, axis=-1)

    def compute_error(
        self, theta: Any = None, disc: int = 64, n_times: int = 5
    ) -> Optional[float]:
        """Relative L2 error vs the exact solution (reference error report).

        Returns None when the problem has no ``c_ex``.  Always evaluates at
        exact-f32 matmul precision: the MXU's default bf16 multiply adds
        ~5e-3 of noise to the MEASUREMENT itself (BASELINE.md).
        """
        if self.pde.c_ex is None:
            return None
        with matmul_precision_scope("highest"):
            return self._compute_error_inner(theta, disc, n_times)

    def _compute_error_inner(
        self, theta: Any = None, disc: int = 64, n_times: int = 5
    ) -> Optional[float]:
        theta = self.theta if theta is None else theta
        pts, mask = self.pde.domain.grid_in_domain(
            (disc + 1,) * self.pde.dim if self.pde.dim > 1 else disc + 1
        )
        pts = pts[mask]
        mu0 = self.pde.mor.samples[0] if self.pde.mor is not None else None
        if self.static.time_dependent:
            t0, t1 = self.pde.t_interval
            preds, exacts = [], []
            for tv in np.linspace(t0, t1, int(n_times)):
                tcol = np.full(pts.shape[0], tv)
                coords = self._make_coords(pts, tcol, mu0)
                u = self._eval_fn(
                    self._replicated(theta), jnp.asarray(coords, self.dtype)
                )
                u = np.asarray(jax.device_get(u), dtype=np.float64)
                if self.hard is not None:
                    u = self._hard_combine(coords, u)
                preds.append(u)
                mu_b = (
                    None
                    if mu0 is None
                    else np.broadcast_to(mu0[None, :], (pts.shape[0], mu0.shape[0]))
                )
                exacts.append(self.pde.eval_exact(pts, tcol, mu_b))
            return rel_l2_error(np.concatenate(preds), np.concatenate(exacts))
        coords = self._make_coords(pts, None, mu0)
        u = self._eval_fn(self._replicated(theta), jnp.asarray(coords, self.dtype))
        u = np.asarray(jax.device_get(u), dtype=np.float64)
        if self.hard is not None:
            u = self._hard_combine(coords, u)
        mu_b = (
            None
            if mu0 is None
            else np.broadcast_to(mu0[None, :], (pts.shape[0], mu0.shape[0]))
        )
        exact = self.pde.eval_exact(pts, None, mu_b)
        return rel_l2_error(u, exact)

    # ------------------------------------------------------------------ #
    # persistence

    def config_dict(self) -> Dict[str, Any]:
        """Problem/discretization fingerprint stored beside checkpoints."""
        return {
            "layer_width": list(self.layer_width),
            "disc_num": self.disc_num
            if np.isscalar(self.disc_num)
            else list(self.disc_num),
            "b_disc_num": self.b_disc_num,
            "t_disc_num": self.t_disc_num,
            "integ_p_num": self.integ_p_num,
            "test_order": self.test_order,
            "activation": self.activation,
            "n_inputs": self.static.n_inputs,
            "n_test": self.static.n_test,
            "time_dependent": self.static.time_dependent,
            "hard_bc": self.hard is not None,
            "param_count": param_count(
                self.theta["net"] if isinstance(self.theta, dict) else self.theta
            ),
        }

    def load_model(self, folderpath: str, step: Optional[int] = None) -> int:
        """Restore params (+opt state) from a case folder (reference
        ``VarNet.loadModel`` — SURVEY.md §3.4).  Verifies the stored config
        fingerprint matches this instance's discretization."""
        from .train.checkpoint import load_config

        stored = load_config(folderpath)
        if stored is not None:
            ours = self.config_dict()
            for k in ("layer_width", "n_inputs", "activation", "time_dependent"):
                if stored.get(k) != ours[k]:
                    raise ValueError(
                        f"checkpoint config mismatch on '{k}': "
                        f"{stored.get(k)} != {ours[k]}"
                    )
        optimizer = make_optimizer(self.optimizer_cfg)
        template = {
            "theta": self.theta,
            "opt_state": optimizer.init(replicate(self.theta, self.mesh)),
        }
        state, step = load_checkpoint(folderpath, jax.device_get(template), step)
        self.theta = state["theta"]
        self.opt_state = state["opt_state"]
        return step

    # ------------------------------------------------------------------ #
    # visualization

    def sim_res(self, folderpath: str, disc: int = 64, n_times: int = 5):
        """Render solution plots into the case folder (reference
        ``VarNet.simRes`` — SURVEY.md §3.3).  Imports matplotlib lazily."""
        from .viz.plot import plot_solution

        return plot_solution(self, folderpath, disc=disc, n_times=n_times)
