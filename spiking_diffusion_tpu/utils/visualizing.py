"""Spike/membrane visualization — spikingjelly ``visualizing/`` parity.

2-D heatmaps over time, 1-D spike rasters, feature-map grids, and
single-neuron v/s traces (``spikingjelly/visualizing/__init__.py:6-365``),
drawn with matplotlib. All functions accept numpy/JAX arrays and return
the Figure; pass ``save_path`` to write a PNG without showing.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _fig(save_path: Optional[str]):
    import matplotlib

    if save_path is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_2d_heatmap(
    array: np.ndarray,
    title: str = "membrane potentials",
    xlabel: str = "simulating step",
    ylabel: str = "neuron index",
    save_path: Optional[str] = None,
):
    """(T, N) array -> heatmap with T on x (parity: plot_2d_heatmap)."""
    plt = _fig(save_path)
    arr = np.asarray(array)
    fig, ax = plt.subplots()
    im = ax.imshow(arr.T, aspect="auto", origin="lower")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_1d_spikes(
    spikes: np.ndarray,
    title: str = "spike raster",
    xlabel: str = "simulating step",
    ylabel: str = "neuron index",
    save_path: Optional[str] = None,
):
    """(T, N) binary spikes -> raster scatter (parity: plot_1d_spikes)."""
    plt = _fig(save_path)
    s = np.asarray(spikes)
    t_idx, n_idx = np.nonzero(s)
    fig, ax = plt.subplots()
    ax.scatter(t_idx, n_idx, s=4, marker="|")
    ax.set_xlim(-0.5, s.shape[0] - 0.5)
    ax.set_ylim(-0.5, s.shape[1] - 0.5)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_2d_feature_map(
    feature_map: np.ndarray,
    nrows: Optional[int] = None,
    ncols: Optional[int] = None,
    title: str = "feature maps",
    save_path: Optional[str] = None,
):
    """(C, H, W) maps -> tiled grid (parity: plot_2d_bool_spikes /
    plot_2d_feature_map)."""
    plt = _fig(save_path)
    fm = np.asarray(feature_map)
    c = fm.shape[0]
    if ncols is None:
        ncols = int(np.ceil(np.sqrt(c)))
    if nrows is None:
        nrows = int(np.ceil(c / ncols))
    fig, axes = plt.subplots(nrows, ncols, squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < c:
            ax.imshow(fm[i], cmap="gray")
    fig.suptitle(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_one_neuron_v_s(
    v: np.ndarray,
    s: np.ndarray,
    v_threshold: float = 1.0,
    v_reset: float = 0.0,
    title: str = "membrane potential and spikes",
    save_path: Optional[str] = None,
):
    """(T,) membrane + (T,) spikes -> two-panel trace (parity:
    plot_one_neuron_v_s)."""
    plt = _fig(save_path)
    v = np.asarray(v).reshape(-1)
    s = np.asarray(s).reshape(-1)
    fig, (ax_v, ax_s) = plt.subplots(2, 1, sharex=True)
    ax_v.plot(v)
    ax_v.axhline(v_threshold, ls="--", lw=0.8, label="v_threshold")
    ax_v.axhline(v_reset, ls=":", lw=0.8, label="v_reset")
    ax_v.set_ylabel("v")
    ax_v.legend(fontsize=7)
    t_idx = np.nonzero(s)[0]
    ax_s.scatter(t_idx, np.zeros_like(t_idx), marker="|")
    ax_s.set_xlabel("simulating step")
    ax_s.set_ylabel("spike")
    fig.suptitle(title)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
