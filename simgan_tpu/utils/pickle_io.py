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


def _downsampled_rows(path: str, downsample_freq: int, load_num_trajs,
                      rng: np.random.RandomState | None):
    """Shared loader core: per-trajectory random-phase downsampling
    (my_pybullet_envs/utils.py:114-135, 137-167, 170-199)."""
    rng = rng or np.random.RandomState()
    with open(path, "rb") as f:
        saved = pickle.load(f)
    start_idx = rng.randint(0, downsample_freq, size=(len(saved),))
    rows = []
    for traj_idx, traj_tuples in saved.items():
        rows.extend(traj_tuples[start_idx[traj_idx] :: downsample_freq])
        if load_num_trajs and traj_idx >= load_num_trajs - 1:
            break
    return rows


def load_combined_sas(path: str, downsample_freq: int = 1, load_num_trajs=None,
                      rng: np.random.RandomState | None = None) -> np.ndarray:
    """Rows of already-merged (s,a,s') features -> one (N, d) matrix
    (reference load_combined_sas_from_pickle, utils.py:114-135)."""
    rows = _downsampled_rows(path, downsample_freq, load_num_trajs, rng)
    return np.asarray(rows, dtype=np.float32)


def load_feat_sas(path: str, downsample_freq: int = 1, load_num_trajs=None,
                  rng: np.random.RandomState | None = None):
    """3-slot [s, a, s'] rows -> (S, A, S') matrices
    (reference load_feat_sas_from_pickle, utils.py:137-167)."""
    rows = _downsampled_rows(path, downsample_freq, load_num_trajs, rng)
    arr = np.array(rows, dtype=object)
    unpack = lambda col: np.array(list(arr[:, col]), dtype=np.float32)
    return unpack(0), unpack(1), unpack(2)


def sample_traj_sas_wpast(trajs: dict, rng: np.random.RandomState | None = None):
    """Pick one random trajectory from loaded pickle content; return its
    (T+1, s_dim) state matrix (current states + final next-state) and
    (T, a_dim) newest-frame actions (reference
    sample_traj_from_pickle_sas_wpast, utils.py:202-230)."""
    rng = rng or np.random.RandomState()
    idx = rng.choice(len(trajs))
    rows = np.array(trajs[idx], dtype=object)
    len_win = (rows.shape[1] - 1) // 2
    s0 = np.array(list(rows[:, 0]), dtype=np.float32)
    a0 = np.array(list(rows[:, len_win]), dtype=np.float32)
    s1 = np.array(list(rows[:, -1]), dtype=np.float32)
    return np.concatenate([s0, s1[-1:]], axis=0), a0


def select_and_merge_from_s_a(s_mt, a_mt, s_idx=(0,), a_idx=()) -> np.ndarray:
    """Stack selected frames of per-step obs/act window lists into one flat
    vector (reference utils.py:266-277; the behavior-obs frame stacking)."""
    parts = [np.asarray(s_mt[i], dtype=np.float32) for i in s_idx]
    parts += [np.asarray(a_mt[j], dtype=np.float32) for j in a_idx]
    return np.concatenate(parts) if parts else np.zeros((0,), np.float32)


def replace_obs_with_feat(obs: np.ndarray, feat_select_func=None) -> np.ndarray:
    """Map a (B, obs_dim) batch through a per-row feature selector
    (reference utils.py:310-331; identity when no selector).  Host-side —
    torch tensor round-trips collapse to a plain array op here."""
    obs = np.asarray(obs)
    if feat_select_func is None:
        return obs
    return np.stack([np.asarray(feat_select_func(o)) for o in obs])


def mirror_obsact_batch(x, mirror_func, augment: bool = True):
    """Mirror a (B, d) obs/act batch; optionally append it to the original
    (reference utils.py:334-357).  mirror_func must be batch-vectorized
    (e.g. simgan_tpu.envs.laikago_mirror.mirror_obs / mirror_action)."""
    mirrored = mirror_func(x)
    if not augment:
        return mirrored
    return np.concatenate([np.asarray(x), np.asarray(mirrored)], axis=0)
