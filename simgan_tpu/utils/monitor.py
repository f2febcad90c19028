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


def one_sided_ema(xolds: np.ndarray, yolds: np.ndarray, low: float | None = None,
                  high: float | None = None, n: int = 512,
                  decay_steps: float = 1.0, low_counts_threshold: float = 1e-8):
    """Causal EMA smoothing + resampling onto an even n-point grid.

    Matches baselines plot_util.one_sided_ema semantics (no extrapolation:
    requires xolds[0] <= low and high <= xolds[-1]); implemented as a
    vectorized bucket-accumulate over the input points followed by an
    n-step decay recursion over the grid, instead of the reference's
    point-merge loop.  Returns (xs, ys, count_ys); grid points whose decayed
    sample count is below ``low_counts_threshold`` are NaN.
    """
    xolds = np.asarray(xolds, dtype=np.float64)
    yolds = np.asarray(yolds, dtype=np.float64)
    assert len(xolds) == len(yolds)
    low = xolds[0] if low is None else low
    high = xolds[-1] if high is None else high
    assert xolds[0] <= low and high <= xolds[-1], (
        f"no extrapolation: need xolds[0] <= {low} and {high} <= xolds[-1]")

    xs = np.linspace(low, high, n)
    decay_period = (high - low) / (n - 1) * decay_steps
    # every input point lands in the first grid slot at/after it; its
    # contribution there is already decayed by its distance to that slot
    slot = np.minimum(np.searchsorted(xs, xolds, side="left"), n - 1)
    w = np.exp(-(xs[slot] - xolds) / decay_period)
    in_range = xolds <= high
    b_sum = np.bincount(slot[in_range], weights=(w * yolds)[in_range], minlength=n)
    b_cnt = np.bincount(slot[in_range], weights=w[in_range], minlength=n)
    d = np.exp(-1.0 / decay_steps)
    sum_ys = np.empty(n)
    count_ys = np.empty(n)
    s = c = 0.0
    for i in range(n):  # n is small (default 512); recursion must be serial
        s = s * d + b_sum[i]
        c = c * d + b_cnt[i]
        sum_ys[i] = s
        count_ys[i] = c
    with np.errstate(invalid="ignore", divide="ignore"):
        ys = sum_ys / count_ys
    ys[count_ys < low_counts_threshold] = np.nan
    return xs, ys, count_ys


def symmetric_ema(xolds, yolds, low=None, high=None, n: int = 512,
                  decay_steps: float = 1.0, low_counts_threshold: float = 1e-8):
    """Two-sided EMA resampling: count-weighted blend of a forward and a
    reversed one-sided pass (baselines plot_util.symmetric_ema semantics)."""
    xolds = np.asarray(xolds, dtype=np.float64)
    yolds = np.asarray(yolds, dtype=np.float64)
    low = xolds[0] if low is None else low
    high = xolds[-1] if high is None else high
    xs, ys_f, cnt_f = one_sided_ema(xolds, yolds, low, high, n, decay_steps, 0)
    _, ys_b, cnt_b = one_sided_ema(-xolds[::-1], yolds[::-1], -high, -low, n,
                                   decay_steps, 0)
    ys_b, cnt_b = ys_b[::-1], cnt_b[::-1]
    cnt = cnt_f + cnt_b
    with np.errstate(invalid="ignore", divide="ignore"):
        ys = (np.nan_to_num(ys_f) * cnt_f + np.nan_to_num(ys_b) * cnt_b) / cnt
    ys[cnt < low_counts_threshold] = np.nan
    return xs, ys, cnt


def load_results(root_dirs: str | list[str]) -> list[dict]:
    """Recursively collect runs (dirs containing *.monitor.csv) under the
    given roots (baselines plot_util.load_results analog).  Each result is
    {"dirname", "monitor": {r, l, t}}."""
    if isinstance(root_dirs, str):
        root_dirs = [root_dirs]
    results = []
    for root in root_dirs:
        for dirpath, _dirnames, filenames in sorted(os.walk(root)):
            if any(fn.endswith(MonitorWriter.EXT) for fn in filenames):
                data = load_monitor_csvs(dirpath)
                if len(data["r"]):
                    results.append({"dirname": dirpath, "monitor": data})
    return results


def default_xy(result: dict) -> tuple[np.ndarray, np.ndarray]:
    """cumulative env steps vs smoothed episode reward (plot_util default)."""
    m = result["monitor"]
    return np.cumsum(m["l"]), smooth(m["r"], radius=10)


def plot_results(results: list[dict], out_path: str, *, xy_fn=default_xy,
                 split_fn=lambda r: "", group_fn=lambda r: r["dirname"],
                 average_group: bool = False, shaded_std: bool = True,
                 resample: int = 0, ncols: int = 2):
    """Grid plot of run groups (plot_util.plot_results analog).

    ``split_fn`` assigns each result to a subplot, ``group_fn`` to a legend
    group within it.  With ``average_group`` the per-group curves are
    resampled onto a common grid (symmetric EMA, ``resample`` points or 512)
    and drawn as mean with an optional std band.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels: dict[str, dict[str, list]] = {}
    for r in results:
        panels.setdefault(split_fn(r), {}).setdefault(group_fn(r), []).append(r)
    ncols = min(ncols, max(1, len(panels)))
    nrows = (len(panels) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(6 * ncols, 4 * nrows),
                             squeeze=False)
    for k, (title, groups) in enumerate(sorted(panels.items())):
        ax = axes[k // ncols][k % ncols]
        for name, rs in sorted(groups.items()):
            xys = [xy_fn(r) for r in rs]
            if average_group and len(xys) > 1:
                low = max(x[0] for x, _ in xys)
                high = min(x[-1] for x, _ in xys)
                n = resample or 512
                ys = np.stack([
                    symmetric_ema(x, y, low, high, n)[1] for x, y in xys])
                xs = np.linspace(low, high, n)
                mean = np.nanmean(ys, axis=0)
                ax.plot(xs, mean, label=f"{name} (n={len(rs)})")
                if shaded_std:
                    std = np.nanstd(ys, axis=0)
                    ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
            else:
                for x, y in xys:
                    if resample:
                        x, y, _ = symmetric_ema(x, y, n=resample)
                    ax.plot(x, y, label=name)
        ax.set_title(title or None)
        ax.set_xlabel("timesteps")
        ax.set_ylabel("episode reward")
        ax.legend(fontsize=8)
    for k in range(len(panels), nrows * ncols):
        axes[k // ncols][k % ncols].axis("off")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


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
