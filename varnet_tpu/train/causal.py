"""Causal (growing-time-window) training for source-driven transient
problems.

Source-driven configs with homogeneous BC/IC can train to the u = 0
zero-data attractor under full-window training: u = 0 satisfies every
data term exactly and sits in a quasi-minimum of the interior loss
(DESIGN.md 'zero-data attractor', measured round 2).  The attractor is
TIME-GLOBAL — with the whole window in the loss the gated source's small
contribution is swamped.  Growing the window makes it local: train
t in [0, w_1 T] first (where the source drives a large residual share),
then extend with warm starts so each stage starts from a state already
carrying the plume.  Measured effect (benchmarks/contaminant_causal.py):
the original contaminant config (kappa=0.01, sigma=0.06) escapes u = 0
and tracks the CN-FDM plume amplitude within a few percent per window.

The trial net must mean the same thing across stages, so every stage's
``VarNet`` is built with ``input_scaling=False`` unless the caller
overrides it — input scaling would remap t per window and invalidate the
warm start.

SURVEY.md §0 item 8 names contaminant transport as the reference's
flagship application; this module is the capability that makes its
original parameters trainable (beyond-reference: the TF1 reference has
no curriculum machinery).
"""

from typing import Any, Callable, Dict, List, Optional, Sequence

__all__ = ["train_causal"]


def train_causal(
    make_pde: Callable[[float], Any],
    windows: Sequence[float] = (0.25, 0.5, 0.75, 1.0),
    epoch_num: int = 8000,
    weight: Optional[Sequence[float]] = None,
    t_disc_full: int = 32,
    varnet_kwargs: Optional[Dict[str, Any]] = None,
    train_kwargs: Optional[Dict[str, Any]] = None,
    folderpath: Optional[str] = None,
    stage_hook: Optional[Callable] = None,
    stage_transfer: Optional[Callable] = None,
    verbose: bool = True,
    resume: bool = False,
):
    """Train through a growing sequence of time windows with warm starts.

    Args:
      make_pde: ``make_pde(t_end) -> ADPDE`` posed on t in [0, t_end]
        (fraction of the full interval; the final window must be 1.0-
        relative, i.e. the full problem).
      windows: increasing window fractions; the last must be 1.0.
      epoch_num: Adam epochs per window.
      weight: loss weights, as ``VarNet.train``.
      t_disc_full: time elements at the FULL window; each stage uses
        ``round(t_disc_full * w)`` (>= 4) so dt stays fixed across stages.
      varnet_kwargs: forwarded to every stage's ``VarNet`` constructor
        (``input_scaling`` defaults to False here — see module docstring).
      train_kwargs: forwarded to every stage's ``.train`` call.
      folderpath: when set, stage i checkpoints under
        ``{folderpath}_w{window}`` — causal runs are hours-long on real
        problems and a device fault mid-stage must not lose the
        warm-start chain (measured in anger, see
        benchmarks/contaminant_causal.py).
      stage_hook: optional ``stage_hook(vn, window, result) -> dict`` run
        after each stage; its return value is merged into that stage's
        record (e.g. a plume-amplitude check — see
        benchmarks/contaminant_causal.py).
      stage_transfer: optional ``stage_transfer(theta, w_prev, w_next)
        -> theta`` applied to the warm-start iterate when the window
        grows.  Needed when the trial ansatz itself depends on the
        window: with ``hard_bc`` the time gate is tau = (t - t0)/(T -
        t0), so extending T rescales tau by w_prev/w_next uniformly —
        scaling the net's OUTPUT layer by w_next/w_prev makes the
        warm-started field exactly match the previous stage on the
        overlap (see benchmarks/obstacle_causal.py).
      verbose: per-stage progress lines.
      resume: continue a dead run from its per-stage checkpoints
        (requires ``folderpath``; SURVEY.md §5.3).  Stages whose folder
        already holds ``epoch_num`` epochs are restored and skipped
        (``stage_hook`` is not re-run for them — their record is
        ``{"t_end", "resumed", "epochs_done"}``); a partially-trained
        stage trains only its remaining epochs; later stages run
        normally.  ``train_kwargs`` must not carry its own ``resume`` —
        the curriculum manages it per stage.

    Returns:
      ``(vn, stages)`` — the final-window ``VarNet`` (train further, or
      ``refine_lm``, or ``evaluate``) and a list of per-stage dicts.
    """
    from ..api import VarNet

    windows = [float(w) for w in windows]
    if not windows or abs(windows[-1] - 1.0) > 1e-12:
        raise ValueError("the final window must be 1.0 (the full interval)")
    if any(b <= a for a, b in zip(windows, windows[1:])):
        raise ValueError("windows must be strictly increasing")
    if windows[0] <= 0.0:
        raise ValueError("windows must be positive fractions of the "
                         "interval (got a window <= 0)")

    if resume and folderpath is None:
        raise ValueError(
            "resume=True requires folderpath (nothing to resume from)"
        )
    vkw = dict(varnet_kwargs or {})
    vkw.setdefault("input_scaling", False)
    tkw = dict(train_kwargs or {})
    tkw.setdefault("verbose", verbose)
    if "resume" in tkw:
        raise ValueError(
            "pass resume to train_causal itself, not via train_kwargs "
            "(the curriculum manages per-stage resume)"
        )
    for key in ("epoch_num", "weight", "folderpath"):
        if key in tkw:
            # epoch_num/weight collide with the explicit train() call
            # below (TypeError); a shared folderpath would make every
            # stage checkpoint into ONE folder with overlapping epoch
            # numbering, silently corrupting the recovery chain.
            raise ValueError(
                f"pass {key} to train_causal itself, not via train_kwargs"
            )

    from .checkpoint import list_checkpoint_steps

    theta = None
    stages: List[Dict[str, Any]] = []
    vn = None
    w_prev = None
    for w in windows:
        pde = make_pde(w)
        vn = VarNet(pde, t_disc_num=max(4, int(round(t_disc_full * w))),
                    **vkw)
        if theta is not None:
            if stage_transfer is not None and w_prev is not None:
                theta = stage_transfer(theta, w_prev, w)
            vn.theta = theta
        w_prev = w
        tkw.setdefault("save_freq", max(epoch_num // 2, 1))
        if folderpath is not None:
            tkw["folderpath"] = f"{folderpath}_w{w:g}"
        done = 0
        if resume and folderpath is not None:
            ck = list_checkpoint_steps(tkw["folderpath"])
            done = ck[-1] if ck else 0
        if done >= epoch_num:
            # completed stage: restore its theta (params-only) and skip
            step, _ = vn._restore_theta(tkw["folderpath"])
            theta = vn.theta
            rec = {"t_end": w, "resumed": True, "epochs_done": step}
            stages.append(rec)
            if verbose:
                print(f"[varnet/causal] window [0,{w}]: resumed complete "
                      f"({step} epochs), skipping", flush=True)
            continue
        # epoch_num is the per-window TOTAL budget: train(resume=True)
        # uses global epoch semantics and runs only the remainder
        res = vn.train(epoch_num=epoch_num, weight=weight,
                       resume=bool(done), **tkw)
        theta = vn.theta
        # res can be EMPTY: train()'s fault-retry path returns an empty
        # TrainResult when the fault landed after the final checkpoint
        # ("work already done"), and the budget-met no-op does the same.
        final_loss = res.losses[-1]["loss"] if res.losses else None
        rec = {"t_end": w, "final_loss": final_loss, "result": res}
        if stage_hook is not None:
            rec.update(stage_hook(vn, w, res) or {})
        stages.append(rec)
        if verbose:
            loss_s = ("n/a (restored complete)" if final_loss is None
                      else f"{final_loss:.3e}")
            print(f"[varnet/causal] window [0,{w}]: loss {loss_s}",
                  flush=True)
    return vn, stages
