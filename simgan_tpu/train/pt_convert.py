"""Convert the reference's shipped PyTorch checkpoints to simgan_tpu npz.

The reference saves whole pickled nn.Modules (``torch.save([actor_critic,
ob_rms], path)`` — main.py:260-269) and loads them with ``utils.load``
(my_pybullet_envs/utils.py:24-56), which requires the original class
definitions importable.  This converter instead unpickles with *stub*
classes for anything outside torch (so no reference code is executed),
walks the module graph exactly like ``nn.Module.state_dict`` would, and
re-emits the tensors as a simgan_tpu flat-npz param pytree
(train/checkpoints.py layout).

This makes the repo's shipped behavior policies
(``trained_models_hopper_bullet_new11/ppo/HopperURDFEnv-v3.pt``,
``trained_models_laika_bullet_70/ppo/LaikagoBulletEnv-v4.pt``) directly
usable as stage-0 policies, so stages 0.5/1/2 run from the *reference's
own* behavior policy — the apples-to-apples comparison the paper
reproduction needs.

Supported module families:
  * Policy(MLPBase + DiagGaussian)  -> MLPPolicy       (model.py:37-114, 233-264)
  * SplitPolicy(SplitPolicyBaseNew) -> SplitPolicy     (model_split.py:157-238)
  * gail.Discriminator              -> Discriminator   (algo/gail.py:33-48)

Usage:
    python -m simgan_tpu.train.pt_convert <ckpt.pt> <out_dir> <env_name> [--disc]
"""

from __future__ import annotations

import io
import pickle
import sys

import numpy as np


# ---------------------------------------------------------------------------
# Stub unpickling: any class outside torch/numpy/stdlib becomes an empty
# container that just records its state dict.
# ---------------------------------------------------------------------------

_SAFE_PREFIXES = ("torch", "numpy", "collections", "builtins", "copyreg",
                  "_codecs", "argparse")


class _Stub:
    _stub_name = "?"

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __repr__(self):
        return f"<stub {self._stub_name}>"


def _make_pickle_module():
    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "__builtin__":  # py2-era alias torch emits
                module = "builtins"
            if module.split(".")[0] in [p.split(".")[0] for p in _SAFE_PREFIXES]:
                return super().find_class(module, name)
            return type(name, (_Stub,), {"_stub_name": f"{module}.{name}"})

    class shim:
        Unpickler = StubUnpickler
        load = staticmethod(pickle.load)
        # torch.load introspection hooks
        __name__ = "simgan_tpu_stub_pickle"

    return shim


def read_pt(path: str):
    """Load a reference checkpoint without its class definitions.

    Returns the unpickled object graph ([policy, ob_rms] for policies,
    discriminator module for _D files) with stub instances in place of the
    reference classes; tensors come through as real torch tensors.
    """
    import torch

    with open(path, "rb") as f:
        data = f.read()
    return torch.load(io.BytesIO(data), map_location="cpu",
                      pickle_module=_make_pickle_module(),
                      weights_only=False)


def state_dict_of(module, prefix="") -> dict[str, np.ndarray]:
    """Walk a stubbed nn.Module graph like nn.Module.state_dict()."""
    out: dict[str, np.ndarray] = {}
    d = getattr(module, "__dict__", {})
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = np.asarray(p.detach().numpy(), dtype=np.float32)
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = np.asarray(b.detach().numpy(), dtype=np.float32)
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(state_dict_of(child, f"{prefix}{name}."))
    return out


# ---------------------------------------------------------------------------
# state-dict -> flax param pytrees
# ---------------------------------------------------------------------------

def _dense(sd, torch_name):
    return {"kernel": sd[torch_name + ".weight"].T,
            "bias": sd[torch_name + ".bias"]}


def _trunk(sd, torch_name):
    # reference Sequential(Linear, Tanh, Linear, Tanh): indices 0 and 2
    return {"Dense_0": _dense(sd, torch_name + ".0"),
            "Dense_1": _dense(sd, torch_name + ".2")}


def policy_params(sd: dict[str, np.ndarray]):
    """Policy(MLPBase, DiagGaussian) state dict -> (MLPPolicy, params)."""
    from simgan_tpu.agents.networks import MLPPolicy

    logstd = sd["dist.logstd._bias"].reshape(-1)  # AddBias stores (act, 1)
    params = {"params": {
        "actor": _trunk(sd, "base.actor"),
        "critic": _trunk(sd, "base.critic"),
        "critic_linear": _dense(sd, "base.critic_linear"),
        "fc_mean": _dense(sd, "dist.fc_mean"),
        "logstd": logstd,
    }}
    hidden = sd["base.actor.0.weight"].shape[0]
    model = MLPPolicy(action_dim=logstd.shape[0], hidden=hidden)
    return model, params


def split_policy_params(sd: dict[str, np.ndarray]):
    """SplitPolicyBaseNew + StateDiagGaussianNew -> (SplitPolicy, params)."""
    from simgan_tpu.agents.networks import SplitPolicy

    num_feet = sd["dist.contact_mean.weight"].shape[0] // 4
    hidden = sd["base.actor_contact.0.weight"].shape[0]
    params = {"params": {
        "actor_contact": _trunk(sd, "base.actor_contact"),
        "actor_actuator": _trunk(sd, "base.actor_actuator"),
        "critic_full": _trunk(sd, "base.critic_full"),
        "critic_linear": _dense(sd, "base.critic_linear"),
        "contact_mean": _dense(sd, "dist.contact_mean"),
        "actuator_mean": _dense(sd, "dist.actuator_mean"),
        "contact_logstd": _dense(sd, "dist.contact_logstd"),
        "actuator_logstd": _dense(sd, "dist.actuator_logstd"),
    }}
    return SplitPolicy(num_feet=num_feet, hidden=hidden), params


def disc_params(sd: dict[str, np.ndarray]):
    """gail.Discriminator trunk (Linear,Tanh,Linear,Tanh,Linear)."""
    from simgan_tpu.agents.networks import Discriminator

    params = {"params": {
        "Dense_0": _dense(sd, "trunk.0"),
        "Dense_1": _dense(sd, "trunk.2"),
        "Dense_2": _dense(sd, "trunk.4"),
    }}
    return Discriminator(hidden=sd["trunk.0.weight"].shape[0]), params


def convert(pt_path: str, out_dir: str, env_name: str, disc: bool = False):
    """Convert one .pt file; returns (model, params) and writes the npz."""
    from simgan_tpu.train import checkpoints

    obj = read_pt(pt_path)
    if disc:
        sd = state_dict_of(obj)
        model, params = disc_params(sd)
    else:
        policy = obj[0] if isinstance(obj, (list, tuple)) else obj
        sd = state_dict_of(policy)
        if any(k.startswith("base.actor_contact") for k in sd):
            model, params = split_policy_params(sd)
        else:
            model, params = policy_params(sd)
    path = checkpoints.save_policy(out_dir, env_name, model, params, disc=disc)
    print(f"converted {pt_path} -> {path} "
          f"({type(model).__name__}, {sum(v.size for v in sd.values())} scalars)")
    return model, params


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    disc = "--disc" in argv
    if disc:
        argv.remove("--disc")
    pt_path, out_dir, env_name = argv
    convert(pt_path, out_dir, env_name, disc)


if __name__ == "__main__":
    main()
