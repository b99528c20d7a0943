"""Reference-pattern stand-in on the ORIGINAL contaminant config
(VERDICT r2 next #2b).

The kappa=0.01/sigma=0.06 volumetric-source config trains to the u = 0
zero-data attractor in our framework (contaminant_validation.json
"source": rel-L2 0.964; DESIGN.md).  This script runs the SAME config
through the reference computational pattern (torch-CPU MLP, reverse-mode
autodiff for grad(u)/u_t a la tf.gradients, identical weak-form loss,
identical (1,10,10) weights, full-batch Adam — cf. baseline_torch.py) and
scores it against the same CN-FDM field, establishing whether the failure
is ours or the METHOD's.

Run: python benchmarks/contaminant_parity_torch.py [--epochs 4000]
(CPU; ~1-2 h at the default reduced discretization — the attractor is a
property of the data/physics, not the mesh, and the paired VarNet run at
the SAME discretization is recorded alongside for apples-to-apples.)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from varnet_tpu.fem.assembly import build_fixed_data  # noqa: E402
from varnet_tpu.problems.analytic import contaminant_transport_2d  # noqa: E402
from varnet_tpu.utils.helpers import rel_l2_error  # noqa: E402

DATA = Path(__file__).parent / "data"
RESULTS = Path(__file__).parent / "results"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=24)
    ap.add_argument("--tdisc", type=int, default=12)
    ap.add_argument("--bdisc", type=int, default=24)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--kappa", type=float, default=0.01)
    ap.add_argument("--sigma", type=float, default=0.06)
    args = ap.parse_args()

    torch.manual_seed(0)
    case = contaminant_transport_2d(kappa=args.kappa, src_sigma=args.sigma)
    fd = build_fixed_data(case["pde"], args.disc, b_disc_num=args.bdisc,
                          t_disc_num=args.tdisc)
    st = fd.static
    k, nq, d = st.n_test, st.n_quad_per_test, st.n_space
    print(f"[parity] {k} test fns x {nq} quad pts", flush=True)

    coords = torch.tensor(fd.quad.coords.reshape(-1, st.n_inputs),
                          dtype=torch.float32, requires_grad=True)
    N = torch.tensor(fd.quad.N, dtype=torch.float32)
    dN = torch.tensor(fd.quad.dN, dtype=torch.float32)
    w = torch.tensor(fd.quad.w, dtype=torch.float32)
    kappa = torch.tensor(fd.quad.kappa, dtype=torch.float32)
    vel = torch.tensor(fd.quad.vel, dtype=torch.float32)
    src = torch.tensor(fd.quad.src, dtype=torch.float32)
    bc_x = torch.tensor(fd.bc.coords, dtype=torch.float32)
    bc_g = torch.tensor(fd.bc.values, dtype=torch.float32)
    ic_x = torch.tensor(fd.ic.coords, dtype=torch.float32)
    ic_g = torch.tensor(fd.ic.values, dtype=torch.float32)
    vol = float(fd.quad.w.sum())

    H, L = args.width, args.layers
    layers = [torch.nn.Linear(st.n_inputs, H), torch.nn.Tanh()]
    for _ in range(L - 1):
        layers += [torch.nn.Linear(H, H), torch.nn.Tanh()]
    layers += [torch.nn.Linear(H, 1)]
    net = torch.nn.Sequential(*layers)
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=max(args.epochs // 4, 1), gamma=0.4
    )

    # identical loss semantics to train/loss.py (normalize_residual=True,
    # weights (1, 10, 10))
    def step():
        opt.zero_grad()
        u = net(coords)[:, 0]
        (du,) = torch.autograd.grad(u.sum(), coords, create_graph=True)
        grad_u = du[:, :d].reshape(k, nq, d)
        u_t = du[:, d].reshape(k, nq)
        adv = torch.einsum("kqd,kqd->kq", vel, grad_u)
        integrand = (u_t + adv - src) * N[None, :] + kappa * torch.einsum(
            "kqd,qd->kq", grad_u, dN
        )
        r = torch.einsum("kq,q->k", integrand, w) / vol
        loss_int = (r * r).sum() / k
        loss_bc = ((net(bc_x)[:, 0] - bc_g) ** 2).mean()
        loss_ic = ((net(ic_x)[:, 0] - ic_g) ** 2).mean()
        loss = loss_int + 10.0 * loss_bc + 10.0 * loss_ic
        loss.backward()
        opt.step()
        sched.step()
        return float(loss), float(loss_int)

    t0 = time.perf_counter()
    for ep in range(args.epochs):
        loss, loss_int = step()
        if ep % 200 == 0 or ep == args.epochs - 1:
            print(f"[parity] epoch {ep:6d}  loss {loss:.4e}  "
                  f"int {loss_int:.4e}  ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
    wall = time.perf_counter() - t0

    # score vs the CN-FDM field, t>0 slices (same protocol as
    # contaminant_validation.score)
    z = np.load(DATA / "contaminant_fdm.npz")
    x = z["x"].astype(np.float32)
    preds, trues, per_time = [], [], {}
    with torch.no_grad():
        for s, tval in enumerate(z["times"]):
            if tval <= 0:
                continue
            inp = np.concatenate(
                [x, np.full((x.shape[0], 1), tval, np.float32)], axis=1
            )
            u_net = net(torch.tensor(inp))[:, 0].numpy().astype(np.float64)
            u_fdm = z["u"][s].astype(np.float64)
            preds.append(u_net)
            trues.append(u_fdm)
            per_time[f"t={tval:.3f}"] = rel_l2_error(u_net, u_fdm)
    overall = rel_l2_error(np.concatenate(preds), np.concatenate(trues))
    umax = float(max(np.abs(p).max() for p in preds))

    rec = {
        "overall_rel_l2": overall,
        "per_time": per_time,
        "max_abs_u_net": umax,
        "max_abs_u_fdm": float(np.abs(z["u"]).max()),
        "wall_s": wall,
        "final_loss": loss,
        "config": vars(args),
        "note": "reference-pattern torch-CPU stand-in on the original "
                "kappa=0.01/sigma=0.06 source config; u_max << FDM max "
                "plus rel-L2 ~ 1 means it collapsed to the same u=0 "
                "attractor as the VarNet run (DESIGN.md).",
    }
    RESULTS.mkdir(exist_ok=True)
    p = RESULTS / "contaminant_parity_torch.json"
    p.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
