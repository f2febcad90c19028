"""The six paper experiments: {hopper, laikago} x {deform, heavy, power}.

Exact translations of the root-level train_*.sh drivers (reference:
train_hopper_deform.sh etc.), each with an identification stage
(main_gail_dyn_ppo) and a refinement stage (main with train_dyn=0).

Usage:
    python -m simgan_tpu.train.experiments hopper_deform --stage identify
    python -m simgan_tpu.train.experiments hopper_deform --stage refine
    python -m simgan_tpu.train.experiments laika_heavy --stage both
"""

from __future__ import annotations

import argparse
import dataclasses

from simgan_tpu.train.config import TrainConfig

HOPPER_COMMON = dict(
    env_name="HopperCombinedEnv-v1", num_steps=1000, num_processes=8,
    lr=3e-4, entropy_coef=0.0, num_mini_batch=16, num_env_steps=2_000_000,
    gail_traj_num=200, gail_epoch=5, hidden_size=100,
    gail_downsample_frequency=1, gail_dis_hdim=100, use_split_pi=True,
    num_feet=1, gail=True, gail_dyn=True,
)
LAIKA_COMMON = dict(
    env_name="LaikagoCombinedEnv-v1", num_steps=1000, num_processes=8,
    lr=3e-4, entropy_coef=0.0, ppo_epoch=10, num_mini_batch=16,
    num_env_steps=8_000_000, gail_traj_num=200, gail_epoch=5,
    hidden_size=100, gail_downsample_frequency=1, gail_dis_hdim=100,
    use_split_pi=True, num_feet=4, gamma=0.99, gail=True, gail_dyn=True,
)
HOPPER_REFINE = dict(
    env_name="HopperCombinedEnv-v1", num_steps=1000, num_processes=8,
    lr=1.5e-4, entropy_coef=0.0, ppo_epoch=2, num_mini_batch=8,
    num_env_steps=2_000_000, use_linear_lr_decay=True, clip_param=0.1,
    warm_start_logstd=-1.3,
)
LAIKA_REFINE = dict(
    env_name="LaikagoCombinedEnv-v1", num_steps=1000, num_processes=8,
    lr=1.5e-4, entropy_coef=0.0, ppo_epoch=10, num_mini_batch=8,
    num_env_steps=4_000_000, use_linear_lr_decay=True, clip_param=0.1,
    warm_start_logstd=-1.3,
)

# env kwargs shared by identification runs (act/obs noise on, behavior
# logstd re-diversified, train_dyn=1)
ID_ENV_KWARGS = dict(train_dyn=1, act_noise=1, obs_noise=1, behavior_logstd=-1.3)
REFINE_ENV_KWARGS = dict(train_dyn=0, act_noise=1, obs_noise=1)

EXPERIMENTS = {
    # name: (id-stage config overrides, traj pickle, behavior dir/env,
    #        save dirs, id seed)
    "hopper_deform": dict(
        common=HOPPER_COMMON, refine=HOPPER_REFINE, seed=2_000_000,
        traj="./hopper_new11_deform_n200_3.pkl",
        behavior_dir="trained_models_hopper_bullet_new11/ppo",
        behavior_env="HopperURDFEnv-v3",
        gdyn_dir="trained_models_Gdyn_hopper_bullet_deform_new11_comb_f0",
        refine_dir="trained_models_hopper_bullet_FTGAIL_deform_new11_comb_f0",
        collect_env_kwargs=dict(deform_floor_env=1),
    ),
    "hopper_heavy": dict(
        common=HOPPER_COMMON, refine=HOPPER_REFINE, seed=2_100_000,
        traj="./hopper_new11_heavy_n200_3.pkl",
        behavior_dir="trained_models_hopper_bullet_new11/ppo",
        behavior_env="HopperURDFEnv-v3",
        gdyn_dir="trained_models_Gdyn_hopper_bullet_heavy_new11_comb_f0",
        refine_dir="trained_models_hopper_bullet_FTGAIL_heavy_new11_comb_f0",
        collect_env_kwargs=dict(heavy_head_env=1),
    ),
    "hopper_power": dict(
        common=HOPPER_COMMON, refine=HOPPER_REFINE, seed=2_200_000,
        traj="./hopper_new11_low_n200_3.pkl",
        behavior_dir="trained_models_hopper_bullet_new11/ppo",
        behavior_env="HopperURDFEnv-v3",
        gdyn_dir="trained_models_Gdyn_hopper_bullet_low_new11_comb_f0",
        refine_dir="trained_models_hopper_bullet_FTGAIL_low_new11_comb_f0",
        collect_env_kwargs=dict(low_power_env=1, emf_power_env=1),
    ),
    "laika_deform": dict(
        common=LAIKA_COMMON, refine=LAIKA_REFINE, seed=1_000_000,
        traj="./laika_70_deform_n200_0.pkl",
        behavior_dir="trained_models_laika_bullet_70/ppo",
        behavior_env="LaikagoBulletEnv-v4",
        gdyn_dir="trained_models_Gdyn_laika_bullet_deform70_comb_f0",
        refine_dir="trained_models_laika_bullet_FTGAIL_deform70_comb_f0",
        collect_env_kwargs=dict(deform_floor_env=1),
    ),
    "laika_heavy": dict(
        common=LAIKA_COMMON, refine=LAIKA_REFINE, seed=1_100_000,
        traj="./laika_70_heavy_n200_0.pkl",
        behavior_dir="trained_models_laika_bullet_70/ppo",
        behavior_env="LaikagoBulletEnv-v4",
        gdyn_dir="trained_models_Gdyn_laika_bullet_heavy70_comb_f0",
        refine_dir="trained_models_laika_bullet_FTGAIL_heavy70_comb_f0",
        collect_env_kwargs=dict(heavy_leg_env=1),
    ),
    "laika_power": dict(
        common=LAIKA_COMMON, refine=LAIKA_REFINE, seed=1_200_000,
        traj="./laika_70_low_n200_0.pkl",
        behavior_dir="trained_models_laika_bullet_70/ppo",
        behavior_env="LaikagoBulletEnv-v4",
        gdyn_dir="trained_models_Gdyn_laika_bullet_low70_comb_f0",
        refine_dir="trained_models_laika_bullet_FTGAIL_low70_comb_f0",
        collect_env_kwargs=dict(emf_power_env=1),
    ),
}


def identify(name: str, overrides: dict | None = None):
    """Stage 1: hybrid-simulator identification (GAIL-dyn PPO)."""
    from simgan_tpu.train import checkpoints, train_simgan

    exp = EXPERIMENTS[name]
    cfg = TrainConfig(**{**exp["common"],
                         "gail_traj_path": exp["traj"],
                         "save_dir": exp["gdyn_dir"],
                         "seed": exp["seed"], **(overrides or {})})
    model, params = checkpoints.load_policy(exp["behavior_dir"], exp["behavior_env"])
    env_extra = {"behavior_model": model, "behavior_params": params}
    return train_simgan.train(cfg, dict(ID_ENV_KWARGS), env_extra)


def refine(name: str, overrides: dict | None = None):
    """Stage 2: motor-policy refinement inside the learned hybrid sim."""
    from simgan_tpu.train import checkpoints, train_behavior

    exp = EXPERIMENTS[name]
    cfg = TrainConfig(**{**exp["refine"],
                         "save_dir": exp["refine_dir"],
                         "warm_start": f"{exp['behavior_dir']}/{exp['behavior_env']}",
                         "seed": exp["seed"], **(overrides or {})})
    iters = [80, 100, 120, 140, 160] if "Hopper" in cfg.env_name else [950, 850, 750, 650, 550]
    model, stacked = checkpoints.load_ensemble(
        exp["gdyn_dir"] + "/ppo", cfg.env_name, iters)
    env_extra = {"dyn_model": model, "dyn_ensemble_params": stacked}
    return train_behavior.train(cfg, dict(REFINE_ENV_KWARGS), env_extra)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiment", choices=sorted(EXPERIMENTS))
    p.add_argument("--stage", choices=["identify", "refine", "both"], default="both")
    p.add_argument("--num-devices", type=int, default=1,
                   help="data-parallel device count (env batch sharded over "
                        "a 1-D mesh, parallel/dp.py)")
    p.add_argument("--num-env-steps", type=int, default=None,
                   help="override the experiment's training budget")
    args = p.parse_args(argv)
    overrides: dict = {"num_devices": args.num_devices}
    if args.num_env_steps is not None:
        overrides["num_env_steps"] = args.num_env_steps
    if args.stage in ("identify", "both"):
        identify(args.experiment, overrides)
    if args.stage in ("refine", "both"):
        refine(args.experiment, overrides)


if __name__ == "__main__":
    main()
