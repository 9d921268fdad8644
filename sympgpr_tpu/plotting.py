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
