"""Plotting: loss curves, per-frame error curves, trajectory snapshots.

Headless-matplotlib equivalents of the reference's plotting surface
(/root/reference/src/analysis/plotting.py and the eval curve helpers
train_DFOLD_dynamics.py:157-260). All functions save to file and return the
path; no display dependency.
"""
from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_loss_curves(history: list[dict], out_path: str, keys=None):
    """history = Experiment.train() records or utils.logging.read_metrics."""
    plt = _plt()
    keys = keys or [
        k for k in history[0] if k not in ("step", "time", "steps_per_sec")
    ]
    steps = [h["step"] for h in history]
    fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3), dpi=120)
    if len(keys) == 1:
        axes = [axes]
    for ax, k in zip(axes, keys):
        ax.plot(steps, [h.get(k, np.nan) for h in history])
        ax.set_title(k)
        ax.set_xlabel("step")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_rot_trans_curves(per_frame_metrics: dict, out_path: str):
    """Per-frame rotation/translation error curves with RefAsPred baselines
    (plot_curve_merged equivalent, train:157-195)."""
    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 3), dpi=120)
    for key, ax, title in (
        ("rot", ax1, "rotation error (deg)"),
        ("trans", ax2, "translation MAE (A)"),
    ):
        if key in per_frame_metrics:
            ax.plot(per_frame_metrics[key], label="pred")
        if f"ref_{key}" in per_frame_metrics:
            ax.plot(per_frame_metrics[f"ref_{key}"], "--", label="RefAsPred")
        ax.set_title(title)
        ax.set_xlabel("frame")
        ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_ca_trace(atom37: np.ndarray, out_path: str, stride: int = 1):
    """3D C-alpha traces for a [F, N, 37, 3] trajectory."""
    plt = _plt()
    fig = plt.figure(figsize=(5, 5), dpi=120)
    ax = fig.add_subplot(projection="3d")
    frames = np.asarray(atom37)[::stride]
    for i, frame in enumerate(frames):
        ca = frame[:, 1]
        ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], alpha=0.3 + 0.7 * i / max(len(frames) - 1, 1))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
