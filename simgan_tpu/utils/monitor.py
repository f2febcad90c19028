"""Episode monitor CSV writing + offline reward-curve utilities.

Reference: baselines bench.Monitor writes per-episode ``{r, l, t}`` rows to
``<rank>.monitor.csv`` with a JSON header (baselines/bench/monitor.py), and
results_plotter / plot_util provide smoothing + curve loading
(baselines/results_plotter.py, common/plot_util.py).  Here the vectorized
trainer logs finished episodes from the on-device episode stats instead of a
per-process wrapper, but the CSV format is kept identical so existing
plotting tooling works on our runs.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Iterable

import numpy as np


class MonitorWriter:
    """baselines-compatible monitor.csv writer."""

    EXT = "monitor.csv"

    def __init__(self, log_dir: str, rank: int = 0, env_id: str = ""):
        os.makedirs(log_dir, exist_ok=True)
        self.t_start = time.time()
        path = os.path.join(log_dir, f"{rank}.{self.EXT}")
        self.f = open(path, "w", newline="")
        self.f.write("#%s\n" % json.dumps({"t_start": self.t_start, "env_id": env_id}))
        self.writer = csv.DictWriter(self.f, fieldnames=("r", "l", "t"))
        self.writer.writeheader()
        self.f.flush()

    def record(self, episode_return: float, episode_length: int) -> None:
        self.writer.writerow({
            "r": round(float(episode_return), 6),
            "l": int(episode_length),
            "t": round(time.time() - self.t_start, 6),
        })
        self.f.flush()

    def record_batch(self, returns: Iterable[float], lengths: Iterable[int]) -> None:
        for r, l in zip(returns, lengths):
            self.record(r, l)

    def close(self):
        self.f.close()


def load_monitor_csvs(log_dir: str) -> dict[str, np.ndarray]:
    """Load all monitor CSVs under log_dir -> concatenated arrays r/l/t."""
    rs, ls, ts = [], [], []
    for fn in sorted(os.listdir(log_dir)):
        if not fn.endswith(MonitorWriter.EXT):
            continue
        with open(os.path.join(log_dir, fn)) as f:
            first = f.readline()
            assert first.startswith("#"), first
            reader = csv.DictReader(f)
            for row in reader:
                rs.append(float(row["r"]))
                ls.append(int(row["l"]))
                ts.append(float(row["t"]))
    return {"r": np.asarray(rs), "l": np.asarray(ls), "t": np.asarray(ts)}


def smooth(y: np.ndarray, radius: int = 10, mode: str = "two_sided") -> np.ndarray:
    """Windowed smoothing (baselines plot_util.smooth semantics)."""
    if len(y) < 2 * radius + 1:
        return np.ones_like(y) * y.mean() if len(y) else y
    if mode == "two_sided":
        conv = np.ones(2 * radius + 1)
        out = np.convolve(y, conv, mode="same") / np.convolve(
            np.ones_like(y), conv, mode="same")
        return out
    # causal
    conv = np.ones(radius)
    return np.convolve(y, conv, mode="full")[: len(y)] / np.convolve(
        np.ones_like(y), conv, mode="full")[: len(y)]


def plot_curves(log_dirs: list[str], out_path: str, radius: int = 10):
    """Reward-curve plotting (results_plotter analog); matplotlib optional."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for d in log_dirs:
        data = load_monitor_csvs(d)
        if len(data["r"]) == 0:
            continue
        x = np.cumsum(data["l"])
        ax.plot(x, smooth(data["r"], radius), label=os.path.basename(d.rstrip("/")))
    ax.set_xlabel("timesteps")
    ax.set_ylabel("episode reward")
    ax.legend()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
