"""Poincare portraits and energy-drift plots (matplotlib, headless).

Mirrors the figures every reference driver produces (e.g.
``python/01_pendulum/implicit/main.py:187-222``, three-panel GP / reference /
overlay portraits plus the semilog energy-drift curve) without requiring an
interactive backend.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def portrait(
    qmap, pmap, q_ref=None, p_ref=None, path="portrait.png",
    xlabel="$q$", ylabel="$p$", title=None,
):
    """Three-panel phase portrait: GP map / reference / overlay."""
    plt = _plt()
    qmap, pmap = np.asarray(qmap), np.asarray(pmap)
    fig, axes = plt.subplots(1, 3 if q_ref is not None else 1,
                             figsize=(10, 3), squeeze=False)
    axes = axes[0]
    axes[0].plot(qmap, pmap, "k^", markersize=0.5)
    axes[0].set_xlabel(xlabel)
    axes[0].set_ylabel(ylabel)
    if q_ref is not None:
        axes[1].plot(np.asarray(q_ref), np.asarray(p_ref), ".",
                     color="dodgerblue", markersize=0.5)
        axes[1].set_xlabel(xlabel)
        axes[2].plot(np.asarray(q_ref), np.asarray(p_ref), ".",
                     color="dodgerblue", markersize=0.5)
        axes[2].plot(qmap, pmap, "k^", markersize=0.5)
        axes[2].set_xlabel(xlabel)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def energy_drift(H, path="energy.png", title="Energy drift"):
    """Semilog |H(t) - H(0)| / H(0) (``main.py:218-222``)."""
    plt = _plt()
    H = np.asarray(H)
    fig, ax = plt.subplots(figsize=(5, 3))
    drift = np.abs(H - H[0]) / np.abs(H[0])
    ax.semilogy(np.maximum(drift, 1e-18))
    ax.set_xlabel("n")
    ax.set_ylabel(r"$|H(t)-H(0)|/H(0)$")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def cost_landscape(objective, bounds, path="cost.png", n=40, title="NLL"):
    """Contour of a 2-D objective + finite-difference-vs-autodiff gradient
    check, mirroring the reference's ``plot_cost_function(_jac)`` visual
    diagnostics (``python/05_tokamak/SympGPR/plotting.py:9-63``)."""
    import jax
    import jax.numpy as jnp

    plt = _plt()
    (x0, x1), (y0, y1) = bounds
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    XX, YY = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], 1))
    Z = np.asarray(jax.vmap(objective)(pts)).reshape(n, n)
    Z = np.where(np.isfinite(Z), Z, np.nan)

    mid = jnp.asarray([0.5 * (x0 + x1), 0.5 * (y0 + y1)])
    g_ad = np.asarray(jax.grad(objective)(mid))
    eps = 1e-5
    g_fd = np.array([
        (objective(mid + jnp.array([eps, 0.0]))
         - objective(mid - jnp.array([eps, 0.0]))) / (2 * eps),
        (objective(mid + jnp.array([0.0, eps]))
         - objective(mid - jnp.array([0.0, eps]))) / (2 * eps),
    ])

    fig, ax = plt.subplots(figsize=(5, 4))
    c = ax.contourf(XX, YY, Z, levels=30)
    fig.colorbar(c, ax=ax)
    ax.set_title(
        f"{title}  |grad_ad - grad_fd| = {np.abs(g_ad - g_fd).max():.1e}"
    )
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path, g_ad, g_fd
