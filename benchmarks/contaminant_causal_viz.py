"""Render the causal contaminant solution next to the CN-FDM reference
(the figure committed as results/contaminant_causal_snapshots.png)."""
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from varnet_tpu.api import VarNet
from varnet_tpu.problems.analytic import contaminant_transport_2d
from varnet_tpu.utils.io import load_theta_npz

z = np.load(HERE / "data/contaminant_fdm.npz")
theta = load_theta_npz(HERE / "results/theta_contaminant_causal.npz")

case = contaminant_transport_2d()
vn = VarNet(case["pde"], layer_width=(96, 96, 96), disc_num=8, t_disc_num=4,
            b_disc_num=4, n_devices=1, seed=0, input_scaling=False,
            fourier_features=128, fourier_scale=[0.5, 2.0])
vn.theta = theta

x = z["x"].astype(np.float64)
times = [0.333, 0.667, 1.0]
fig, axes = plt.subplots(len(times), 2, figsize=(10, 7.5),
                         constrained_layout=True)
for r, tv in enumerate(times):
    s = int(np.argmin(np.abs(z["times"] - tv)))
    u_fdm = z["u"][s]
    u_net = vn.evaluate(x, t=np.full(len(x), z["times"][s]))
    vmax = max(abs(u_fdm).max(), abs(u_net).max())
    for c, (u, name) in enumerate([(u_net, "varnet_tpu (causal+msFF)"),
                                   (u_fdm, "CN-FDM reference")]):
        ax = axes[r, c]
        im = ax.tricontourf(x[:, 0], x[:, 1], u, levels=21, cmap="viridis",
                            vmin=0, vmax=vmax)
        ax.set_title(f"{name}, t={z['times'][s]:.3f}", fontsize=9)
        ax.set_aspect("equal")
        fig.colorbar(im, ax=ax, shrink=0.8)
fig.suptitle("Original contaminant config (kappa=0.01, sigma=0.06): "
             "solved at rel-L2 3.6%", fontsize=11)
out = HERE / "results/contaminant_causal_snapshots.png"
fig.savefig(out, dpi=110)
print("saved", out)
