"""CPU reference baseline (stand-in measurement).

The reference (RizaXudayi/VarNet) is TF1 on CPU and publishes NO throughput
numbers (BASELINE.md); its mount was empty during the survey, so per the
SURVEY.md §6 action item the baseline is MEASURED here with a faithful
stand-in: the same flagship 2-D time-dependent AD-PDE configuration, the
same computational pattern as the reference's hot loop (MLP forward at all
quadrature points, reverse-mode autodiff for grad(u)/u_t a la
``tf.gradients``, weak-form residual contraction, Adam update), implemented
in torch-CPU (modern C++ kernels + autograd — if anything, FASTER than the
TF1-sessions original, so the vs_baseline ratio is conservative).

Run:  python benchmarks/baseline_torch.py [--disc 48 --tdisc 32 --steps 3]
Emits one JSON line: {"metric": "quad_evals_per_sec", "value": ...}
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
from varnet_tpu.problems.analytic import transient_ad_2d  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--disc", type=int, default=48)
    ap.add_argument("--tdisc", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--width", type=int, default=20)
    args = ap.parse_args()

    torch.manual_seed(0)
    case, fd = transient_ad_2d(), None
    fd = build_fixed_data(
        case["pde"], args.disc, b_disc_num=48, t_disc_num=args.tdisc
    )
    st = fd.static
    k, nq, d = st.n_test, st.n_quad_per_test, st.n_space

    coords = torch.tensor(
        fd.quad.coords.reshape(-1, st.n_inputs), dtype=torch.float32,
        requires_grad=True,
    )
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

    H = args.width
    net = torch.nn.Sequential(
        torch.nn.Linear(st.n_inputs, H), torch.nn.Tanh(),
        torch.nn.Linear(H, H), torch.nn.Tanh(),
        torch.nn.Linear(H, 1),
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        u = net(coords)[:, 0]
        # reverse-mode input gradient with graph retained for the
        # parameter backward — exactly the tf.gradients pattern
        (du,) = torch.autograd.grad(u.sum(), coords, create_graph=True)
        grad_u = du[:, :d].reshape(k, nq, d)
        u_t = du[:, d].reshape(k, nq)
        adv = torch.einsum("kqd,kqd->kq", vel, grad_u)
        integrand = (u_t + adv - src) * N[None, :] + kappa * torch.einsum(
            "kqd,qd->kq", grad_u, dN
        )
        r = torch.einsum("kq,q->k", integrand, w)
        loss_int = (r * r).sum()
        loss_bc = ((net(bc_x)[:, 0] - bc_g) ** 2).mean()
        loss_ic = ((net(ic_x)[:, 0] - ic_g) ** 2).mean()
        loss = loss_int + 10.0 * loss_bc + 10.0 * loss_ic
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = (time.perf_counter() - t0) / args.steps
    evals = k * nq / dt
    print(json.dumps({
        "metric": "quad_evals_per_sec",
        "value": evals,
        "unit": "quad-pt residual evals/s (torch-CPU baseline stand-in)",
        "sec_per_step": dt,
        "n_test": k,
        "n_quad": nq,
        "loss": loss,
    }))


if __name__ == "__main__":
    main()
