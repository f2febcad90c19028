"""Typed training configuration mirroring the reference flag surface.

Reference: third_party/a2c_ppo_acktr/arguments.py (same knob names, same
defaults) including the ``parse_args_with_unknown`` pass-through that
forwards unrecognized ``--key value`` pairs (float-coerced) to the env
constructor (arguments.py:260-291, envs.py:54-60).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Optional


@dataclasses.dataclass
class TrainConfig:
    algo: str = "ppo"
    lr: float = 3e-4
    eps: float = 1e-5
    alpha: float = 0.99
    gamma: float = 0.99
    use_gae: bool = True
    gae_lambda: float = 0.95
    entropy_coef: float = 0.01
    value_loss_coef: float = 0.5
    max_grad_norm: float = 0.5
    seed: int = 1
    num_processes: int = 16
    num_steps: int = 5
    # data-parallel device count (TPU-native analog of the reference's 8
    # env worker processes, SURVEY §2.5): >1 shards the env batch over a
    # 1-D jax.sharding.Mesh (parallel/dp.py), params/optimizer replicated,
    # gradient all-reduce over ICI.  num_processes must divide evenly.
    num_devices: int = 1
    ppo_epoch: int = 10
    num_mini_batch: int = 32
    clip_param: float = 0.2
    hidden_size: int = 64
    log_interval: int = 10
    save_interval: int = 10
    num_env_steps: int = int(10e6)
    num_episodes: Optional[int] = None
    env_name: str = "HopperURDFEnv-v3"
    log_dir: str = "log/"
    save_dir: str = "./trained_models_0/"
    no_proper_time_limits: bool = False
    recurrent_policy: bool = False
    use_linear_lr_decay: bool = False
    warm_start: str = ""
    warm_start_logstd: Optional[float] = None
    # GAIL group
    gail: bool = False
    gail_dyn: bool = False
    gail_traj_path: str = ""
    gail_batch_size: int = 128
    gail_epoch: int = 5
    gail_traj_num: int = 20
    gail_downsample_frequency: int = 20
    gail_dis_hdim: int = 100
    # which past frames of the 10-deep sas window feed the discriminator
    # (reference main_gail_dyn_ppo.py:152-157; "0" = newest frame only)
    gail_s_idx: str = "0"
    gail_a_idx: str = "0"
    # Framework extension (1 = reference semantics): train K discriminators,
    # each on its own bootstrap resample of the expert windows, and use the
    # MEAN of the per-member log D - log(1-D) rewards.  Identification-side
    # diversity aimed at the laika_heavy transfer seed lottery (RESULTS.md
    # round-3 seed study): the reward signal pi_dyn identifies against is an
    # average over data draws instead of one D's idiosyncratic boundary.
    d_ensemble: int = 1
    no_alive_bonus: bool = False
    use_split_pi: bool = False
    num_feet: int = 1
    # symmetry
    dup_sym: bool = False
    loss_sym: float = 0.0

    @property
    def num_updates(self) -> int:
        return int(self.num_env_steps) // self.num_steps // self.num_processes


_BOOL_FLAGS = {
    "use_gae", "no_proper_time_limits", "use_linear_lr_decay", "gail",
    "gail_dyn", "no_alive_bonus", "use_split_pi", "dup_sym",
    "recurrent_policy",
}


def parse_args(argv=None) -> tuple[TrainConfig, dict[str, Any]]:
    """argparse front-end with unknown-arg pass-through to env kwargs."""
    parser = argparse.ArgumentParser(description="RL")
    cfg = TrainConfig()
    for f in dataclasses.fields(TrainConfig):
        flag = "--" + f.name.replace("_", "-")
        default = getattr(cfg, f.name)
        if f.name == "algo":
            parser.add_argument(flag, default=default,
                                choices=["ppo", "a2c", "acktr"])
        elif f.name in _BOOL_FLAGS:
            parser.add_argument(flag, action="store_true", default=default)
        elif f.name in ("num_episodes", "warm_start_logstd"):
            typ = int if f.name == "num_episodes" else float
            parser.add_argument(flag, type=typ, default=default)
        else:
            parser.add_argument(flag, type=type(default), default=default)
    args, unknown = parser.parse_known_args(argv)

    def try_numerical(s: str):
        try:
            return float(s)
        except ValueError:
            return s

    extra: dict[str, Any] = {}
    it = iter(unknown)
    for k in it:
        assert k.startswith("-"), k
        v = next(it)
        extra[k.lstrip("-").replace("-", "_")] = try_numerical(v)

    cfg = TrainConfig(**{f.name: getattr(args, f.name) for f in dataclasses.fields(TrainConfig)})
    return cfg, extra
