"""Expert trajectory IO, interchangeable with the reference pickle format.

The reference pickles ``{traj_idx: [sas_window rows]}`` where each row is the
21-slot list ``[s_t..s_t-9, a_t..a_t-9, s_t+1]`` (collect_tarsim_traj.py:
218-264).  Loaders mirror my_pybullet_envs/utils.py:170-199
(load_sas_wpast_from_pickle with per-trajectory random-phase downsampling)
and select_and_merge_sas (utils.py:233-263).
"""

from __future__ import annotations

import pickle
from typing import Sequence

import numpy as np


def save_trajs(path: str, trajs: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(trajs, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_sas_wpast(path: str, downsample_freq: int = 1, load_num_trajs=None,
                   rng: np.random.RandomState | None = None):
    """Returns a list of 21 (N, d) matrices in window-slot order."""
    rng = rng or np.random.RandomState()
    with open(path, "rb") as f:
        saved = pickle.load(f)
    n_trajs = len(saved)
    start_idx = rng.randint(0, downsample_freq, size=(n_trajs,))
    rows = []
    for traj_idx, traj_tuples in saved.items():
        rows.extend(traj_tuples[start_idx[traj_idx] :: downsample_freq])
        if load_num_trajs and traj_idx >= load_num_trajs - 1:
            break
    n_slots = np.array(rows, dtype=object).shape[1] if rows else 0
    all_info = []
    arr = np.array(rows, dtype=object)
    for slot in range(n_slots):
        all_info.append(np.array(list(arr[:, slot]), dtype=np.float32))
    return all_info


def select_and_merge_sas(sas: Sequence[np.ndarray], s_idx=(0,), a_idx=(0,)) -> np.ndarray:
    """Pick obs/act frames + always s_t+1 -> discriminator input rows."""
    sas = [np.atleast_2d(np.asarray(x, dtype=np.float32)) for x in sas]
    len_win = (len(sas) - 1) // 2
    parts = [sas[i] for i in s_idx]
    parts += [sas[len_win + j] for j in a_idx]
    parts.append(sas[-1])
    return np.concatenate(parts, axis=1)


def windows_to_rows(obs_win: np.ndarray, act_win: np.ndarray, next_obs: np.ndarray) -> list:
    """Convert one SasWindow to the reference's 21-slot list row."""
    return [list(map(float, o)) for o in obs_win] + \
           [list(map(float, a)) for a in act_win] + [list(map(float, next_obs))]
