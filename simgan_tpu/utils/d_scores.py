"""Discriminator-probability diagnostics.

Reference: collect_tarsim_traj.py:37-63 (matplotlib helpers plotting the
GAIL discriminator's per-step probabilities over imaginary/real rollouts)
and gail.py:212-217 (predict_prob_single_step).  Used to inspect how well
the identified hybrid simulator fools the discriminator along trajectories.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def predict_prob(disc_model, disc_params, feats: jax.Array) -> jax.Array:
    """sigmoid(D(feats)): 1 = classified expert/real, 0 = fake (gail.py:212-217)."""
    return jax.nn.sigmoid(disc_model.apply(disc_params, feats))


def d_scores_over_windows(disc_model, disc_params, windows, s_idx=(0,), a_idx=(0,)):
    """Per-step D probabilities for a batch of SasWindows ((B,T,...) arrays)."""
    feats = windows.select_and_merge(s_idx, a_idx)
    return np.asarray(predict_prob(disc_model, disc_params, feats))


def plot_d_scores(scores: np.ndarray, out_path: str, label: str = "D(real)"):
    """Average per-step D probability curve (collect_tarsim_traj avg_dreward
    plot analog); saves a .png and the raw .npy next to it."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    avg = scores.mean(axis=0) if scores.ndim > 1 else scores
    np.save(os.path.splitext(out_path)[0] + ".npy", avg)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(avg)
    ax.set_xlabel("step")
    ax.set_ylabel(label)
    ax.set_ylim(0, 1)
    ax.axhline(0.5, ls="--", c="gray", lw=0.8)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
