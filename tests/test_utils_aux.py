"""Aux-subsystem units: monitor CSVs, D-score diagnostics, profiling timer,
episode compaction for monitor emission, gym adapter, and the remaining
expert-data utilities (reference my_pybullet_envs/utils.py:114-357)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from simgan_tpu.utils import pickle_io
from simgan_tpu.utils.monitor import MonitorWriter, load_monitor_csvs, smooth


def test_monitor_roundtrip(tmp_path):
    w = MonitorWriter(str(tmp_path), rank=0, env_id="HopperURDFEnv-v3")
    w.record_batch([10.0, 20.5, -1.0], [100, 250, 7])
    w.close()
    data = load_monitor_csvs(str(tmp_path))
    np.testing.assert_allclose(data["r"], [10.0, 20.5, -1.0])
    np.testing.assert_array_equal(data["l"], [100, 250, 7])
    assert np.all(data["t"] >= 0)
    # header is the baselines JSON-comment format
    first = open(tmp_path / "0.monitor.csv").readline()
    assert first.startswith("#") and "HopperURDFEnv-v3" in first


def test_smooth_preserves_constant():
    y = np.full(50, 3.0)
    np.testing.assert_allclose(smooth(y, radius=5), y)


def test_one_sided_ema_matches_direct_sum():
    """The bucket+recursion implementation is algebraically identical to the
    direct decayed sum ys[i] = sum_{x_j<=x_i} y_j e^{-(x_i-x_j)/T} / counts."""
    from simgan_tpu.utils.monitor import one_sided_ema
    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0, 100, 200))
    y = rng.randn(200)
    n, decay_steps = 64, 3.0
    xs, ys, cnt = one_sided_ema(x, y, n=n, decay_steps=decay_steps)
    T = (x[-1] - x[0]) / (n - 1) * decay_steps
    for i in [0, 1, 17, 40, 63]:
        m = x <= xs[i] + 1e-12
        w = np.exp(-(xs[i] - x[m]) / T)
        np.testing.assert_allclose(ys[i], np.sum(w * y[m]) / np.sum(w),
                                   rtol=1e-9)
        np.testing.assert_allclose(cnt[i], np.sum(w), rtol=1e-9)


def test_symmetric_ema_constant_and_linear():
    from simgan_tpu.utils.monitor import symmetric_ema
    x = np.linspace(0, 10, 300)
    xs, ys, _ = symmetric_ema(x, np.full_like(x, 2.5), n=50)
    np.testing.assert_allclose(ys, 2.5)
    # linear data resamples to linear away from the edges
    xs, ys, _ = symmetric_ema(x, 3.0 * x, n=50, decay_steps=1.0)
    mid = slice(5, 45)
    np.testing.assert_allclose(ys[mid], 3.0 * xs[mid], rtol=2e-2)


def test_plot_results_grid(tmp_path):
    from simgan_tpu.utils.monitor import load_results, plot_results
    for run in ("a/seed0", "a/seed1", "b/seed0"):
        d = tmp_path / run
        d.mkdir(parents=True)
        w = MonitorWriter(str(d), env_id=run)
        w.record_batch(np.linspace(0, 50, 40) + len(run), np.full(40, 100))
        w.close()
    results = load_results(str(tmp_path))
    assert len(results) == 3 and all("monitor" in r for r in results)
    out = plot_results(
        results, str(tmp_path / "grid.png"),
        split_fn=lambda r: os.path.basename(os.path.dirname(r["dirname"])),
        group_fn=lambda r: os.path.basename(os.path.dirname(r["dirname"])),
        average_group=True, resample=32)
    assert os.path.getsize(out) > 0


def test_plot_curves_writes_png(tmp_path):
    w = MonitorWriter(str(tmp_path), env_id="X")
    w.record_batch(np.linspace(0, 100, 30), np.full(30, 500))
    w.close()
    from simgan_tpu.utils.monitor import plot_curves
    out = plot_curves([str(tmp_path)], str(tmp_path / "curve.png"), radius=3)
    assert os.path.getsize(out) > 0


def test_compact_episodes_matches_dense():
    from simgan_tpu.train.train_behavior import compact_episodes

    class T:
        ep_done = jnp.asarray(np.random.RandomState(0).rand(13, 7) < 0.2)
        ep_return = jnp.asarray(np.random.RandomState(1).randn(13, 7))
        ep_length = jnp.asarray(np.random.RandomState(2).randint(1, 500, (13, 7)))

    valid, ret, length = jax.device_get(compact_episodes(T))
    done = np.asarray(T.ep_done).reshape(-1)
    np.testing.assert_allclose(np.sort(ret[valid]),
                               np.sort(np.asarray(T.ep_return).reshape(-1)[done]))
    np.testing.assert_array_equal(np.sort(length[valid]),
                                  np.sort(np.asarray(T.ep_length).reshape(-1)[done]))


def test_d_scores_shapes_and_plot(tmp_path):
    from simgan_tpu.agents.networks import Discriminator
    from simgan_tpu.envs.base import SasWindow
    from simgan_tpu.utils import d_scores

    B, T, s, a = 3, 5, 4, 2
    rng = np.random.RandomState(0)
    win = SasWindow(obs=jnp.asarray(rng.randn(B, T, 10, s), jnp.float32),
                    act=jnp.asarray(rng.randn(B, T, 10, a), jnp.float32),
                    next_obs=jnp.asarray(rng.randn(B, T, s), jnp.float32))
    model = Discriminator(hidden=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2 * s + a)))
    scores = d_scores.d_scores_over_windows(model, params, win)
    assert scores.shape == (B, T)
    assert np.all((scores >= 0) & (scores <= 1))
    out = d_scores.plot_d_scores(scores, str(tmp_path / "d.png"))
    assert os.path.getsize(out) > 0
    assert os.path.exists(tmp_path / "d.npy")


def test_step_timer():
    from simgan_tpu.utils.profiling import StepTimer
    t = StepTimer(ema=0.5)
    assert t.tick() is None
    assert t.tick() is not None
    assert t.avg > 0 and t.rate(100) > 0


# ---------------------------------------------------------------------------
# straggler expert-data utils
# ---------------------------------------------------------------------------


def _wpast_pickle(path, n_trajs=3, T=6, s=3, a=2, win=2):
    """{traj: [2*win+1 slot rows]} like collect_tarsim_traj --save-traj."""
    rng = np.random.RandomState(0)
    trajs = {}
    for i in range(n_trajs):
        rows = []
        for t in range(T):
            rows.append([list(rng.randn(s)) for _ in range(win)]
                        + [list(rng.randn(a)) for _ in range(win)]
                        + [list(rng.randn(s))])
        trajs[i] = rows
    with open(path, "wb") as f:
        pickle.dump(trajs, f)
    return trajs


def test_load_feat_sas(tmp_path):
    p = str(tmp_path / "f.pkl")
    rng = np.random.RandomState(3)
    trajs = {i: [[list(rng.randn(4)), list(rng.randn(2)), list(rng.randn(4))]
                 for _ in range(5)] for i in range(2)}
    with open(p, "wb") as f:
        pickle.dump(trajs, f)
    s, a, s1 = pickle_io.load_feat_sas(p)
    assert s.shape == (10, 4) and a.shape == (10, 2) and s1.shape == (10, 4)
    np.testing.assert_allclose(s[0], trajs[0][0][0], rtol=1e-6)


def test_load_combined_sas(tmp_path):
    p = str(tmp_path / "c.pkl")
    trajs = {0: [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], 1: [[7.0, 8.0, 9.0]]}
    with open(p, "wb") as f:
        pickle.dump(trajs, f)
    m = pickle_io.load_combined_sas(p)
    assert m.shape == (3, 3)
    # downsampling keeps every k-th row from a random phase
    m2 = pickle_io.load_combined_sas(p, downsample_freq=2,
                                     rng=np.random.RandomState(0))
    assert m2.shape[1] == 3 and 1 <= m2.shape[0] <= 2


def test_sample_traj_sas_wpast(tmp_path):
    trajs = _wpast_pickle(str(tmp_path / "w.pkl"), n_trajs=2, T=4, s=3, a=2, win=2)
    s_mat, a_mat = pickle_io.sample_traj_sas_wpast(trajs, np.random.RandomState(0))
    assert s_mat.shape == (5, 3) and a_mat.shape == (4, 2)
    # s_mat = current states + appended final next-state
    idx = np.random.RandomState(0).choice(2)
    np.testing.assert_allclose(s_mat[0], trajs[idx][0][0], rtol=1e-6)
    np.testing.assert_allclose(s_mat[-1], trajs[idx][-1][-1], rtol=1e-6)
    np.testing.assert_allclose(a_mat[0], trajs[idx][0][2], rtol=1e-6)


def test_select_and_merge_from_s_a():
    s_mt = [[1.0, 2.0], [3.0, 4.0]]
    a_mt = [[5.0], [6.0]]
    out = pickle_io.select_and_merge_from_s_a(s_mt, a_mt, s_idx=(0, 1), a_idx=(1,))
    np.testing.assert_allclose(out, [1, 2, 3, 4, 6])


def test_replace_obs_with_feat():
    obs = np.arange(12.0).reshape(3, 4)
    np.testing.assert_allclose(pickle_io.replace_obs_with_feat(obs), obs)
    out = pickle_io.replace_obs_with_feat(obs, lambda o: o[:2])
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out[1], obs[1, :2])


def test_mirror_obsact_batch():
    x = np.arange(6.0).reshape(3, 2)
    flip = lambda b: b[:, ::-1]
    aug = pickle_io.mirror_obsact_batch(x, flip)
    assert aug.shape == (6, 2)
    np.testing.assert_allclose(aug[:3], x)
    np.testing.assert_allclose(aug[3:], x[:, ::-1])
    only = pickle_io.mirror_obsact_batch(x, flip, augment=False)
    np.testing.assert_allclose(only, x[:, ::-1])


def test_gym_adapter_api():
    from simgan_tpu.envs.gym_adapter import GymEnv

    env = GymEnv("HopperURDFEnv-v3", seed=0)
    obs = env.reset()
    assert obs.shape == (env.obs_dim,) == (11,)
    a = env.action_space.sample(np.random.RandomState(0))
    obs2, r, done, info = env.step(a)
    assert obs2.shape == (11,) and isinstance(r, float) and isinstance(done, bool)
    w = info["sas_window"]
    assert len(w) == 21 and len(w[0]) == 11 and len(w[10]) == 3 and len(w[20]) == 11
    assert isinstance(env.get_dist(), float)
    assert "HopperEnv" in env.getSourceCode() or "class" in env.getSourceCode()
    # seeding reproduces the initial obs
    env.seed(123)
    o1 = env.reset()
    env.seed(123)
    o2 = env.reset()
    np.testing.assert_allclose(o1, o2)
