"""pt_convert: reference .pt checkpoints -> npz param pytrees.

Builds torch modules with the reference's exact module topology
(model.py:37-114/233-264, model_split.py:157-238, algo/gail.py:33-48,
utils.py:54-65 AddBias), saves them in the legacy (non-zip) torch format the
shipped checkpoints use, converts, and checks the flax forward pass matches
the torch forward pass numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from simgan_tpu.train import checkpoints  # noqa: E402
from simgan_tpu.train.pt_convert import convert  # noqa: E402


class AddBias(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self._bias = tnn.Parameter(torch.randn(n, 1))


class DiagGaussian(tnn.Module):
    def __init__(self, hidden, act):
        super().__init__()
        self.fc_mean = tnn.Linear(hidden, act)
        self.logstd = AddBias(act)


class MLPBase(tnn.Module):
    def __init__(self, obs, hidden):
        super().__init__()
        self.actor = tnn.Sequential(tnn.Linear(obs, hidden), tnn.Tanh(),
                                    tnn.Linear(hidden, hidden), tnn.Tanh())
        self.critic = tnn.Sequential(tnn.Linear(obs, hidden), tnn.Tanh(),
                                     tnn.Linear(hidden, hidden), tnn.Tanh())
        self.critic_linear = tnn.Linear(hidden, 1)


class Policy(tnn.Module):
    def __init__(self, obs=11, act=3, hidden=64):
        super().__init__()
        self.base = MLPBase(obs, hidden)
        self.dist = DiagGaussian(hidden, act)

    def forward(self, x):
        a = self.base.actor(x)
        value = self.base.critic_linear(self.base.critic(x))
        mean = self.dist.fc_mean(a)
        logstd = self.dist.logstd._bias.t().expand_as(mean)
        return value[..., 0], mean, logstd


class SplitBase(tnn.Module):
    def __init__(self, obs, hidden):
        super().__init__()
        mk = lambda: tnn.Sequential(tnn.Linear(obs, hidden), tnn.Tanh(),
                                    tnn.Linear(hidden, hidden), tnn.Tanh())
        self.actor_contact = mk()
        self.actor_actuator = mk()
        self.critic_full = mk()
        self.critic_linear = tnn.Linear(hidden, 1)


class SplitDist(tnn.Module):
    def __init__(self, hidden, num_feet):
        super().__init__()
        self.contact_mean = tnn.Linear(hidden, 4 * num_feet)
        self.actuator_mean = tnn.Linear(hidden, 3 * num_feet)
        self.contact_logstd = tnn.Linear(hidden, 4 * num_feet)
        self.actuator_logstd = tnn.Linear(hidden, 3 * num_feet)


class SplitPolicyTorch(tnn.Module):
    def __init__(self, obs=14, num_feet=1, hidden=100):
        super().__init__()
        self.base = SplitBase(obs, hidden)
        self.dist = SplitDist(hidden, num_feet)

    def forward(self, x):
        c = self.base.actor_contact(x)
        a = self.base.actor_actuator(x)
        value = self.base.critic_linear(self.base.critic_full(x))
        mean = torch.cat([self.dist.contact_mean(c), self.dist.actuator_mean(a)], -1)
        logstd = torch.cat([self.dist.contact_logstd(c), self.dist.actuator_logstd(a)], -1)
        return value[..., 0], mean, logstd


class DiscTorch(tnn.Module):
    def __init__(self, dim=25, hidden=100):
        super().__init__()
        self.trunk = tnn.Sequential(tnn.Linear(dim, hidden), tnn.Tanh(),
                                    tnn.Linear(hidden, hidden), tnn.Tanh(),
                                    tnn.Linear(hidden, 1))

    def forward(self, x):
        return self.trunk(x)[..., 0]


def _legacy_save(obj, path):
    torch.save(obj, path, _use_new_zipfile_serialization=False)


def test_policy_roundtrip(tmp_path):
    torch.manual_seed(0)
    pt = Policy()
    _legacy_save([pt, None], tmp_path / "Env-v3.pt")
    convert(str(tmp_path / "Env-v3.pt"), str(tmp_path / "out"), "Env-v3")
    model, params = checkpoints.load_policy(str(tmp_path / "out"), "Env-v3")
    assert model.action_dim == 3 and model.hidden == 64

    x = np.random.RandomState(1).randn(5, 11).astype(np.float32)
    v_t, m_t, s_t = pt(torch.from_numpy(x))
    v_j, m_j, s_j = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(v_j), v_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_j), m_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_j), s_t.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_split_policy_roundtrip(tmp_path):
    torch.manual_seed(1)
    pt = SplitPolicyTorch()
    _legacy_save([pt, None], tmp_path / "Comb-v1.pt")
    convert(str(tmp_path / "Comb-v1.pt"), str(tmp_path / "out"), "Comb-v1")
    model, params = checkpoints.load_policy(str(tmp_path / "out"), "Comb-v1")
    assert model.num_feet == 1 and model.hidden == 100

    x = np.random.RandomState(2).randn(4, 14).astype(np.float32)
    v_t, m_t, s_t = pt(torch.from_numpy(x))
    v_j, m_j, s_j = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(v_j), v_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_j), m_t.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_j), s_t.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_disc_roundtrip(tmp_path):
    torch.manual_seed(2)
    pt = DiscTorch()
    _legacy_save(pt, tmp_path / "Env-v3_D.pt")
    convert(str(tmp_path / "Env-v3_D.pt"), str(tmp_path / "out"), "Env-v3", disc=True)
    model, params = checkpoints.load_policy(str(tmp_path / "out"), "Env-v3", disc=True)

    x = np.random.RandomState(3).randn(6, 25).astype(np.float32)
    d_t = pt(torch.from_numpy(x)).detach().numpy()
    d_j = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(d_j, d_t, rtol=1e-5, atol=1e-5)


def test_shipped_reference_checkpoints_convert(tmp_path):
    """The actual shipped reference policies convert with the right shapes."""
    import os
    for pt_path, env, obs, act in [
        ("/root/reference/trained_models_hopper_bullet_new11/ppo/HopperURDFEnv-v3.pt",
         "HopperURDFEnv-v3", 11, 3),
        ("/root/reference/trained_models_laika_bullet_70/ppo/LaikagoBulletEnv-v4.pt",
         "LaikagoBulletEnv-v4", 111, 12),
    ]:
        if not os.path.exists(pt_path):
            pytest.skip("reference checkpoints not present")
        model, params = convert(pt_path, str(tmp_path / "out"), env)
        assert model.action_dim == act
        assert params["params"]["actor"]["Dense_0"]["kernel"].shape == (obs, 64)
        v, m, s = model.apply(params, np.zeros((2, obs), np.float32))
        assert m.shape == (2, act) and np.all(np.isfinite(np.asarray(m)))
