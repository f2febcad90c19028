class HopperCombinedEnv:
    """Pure combined env; frozen policy parameters are baked in as constants."""

    act_dim_robot = ACT_DIM
    robot_obs_dim = OBS_DIM

    def __init__(
        self,
        config: HopperCombinedConfig = HopperCombinedConfig(),
        behavior_model=None,
        behavior_params=None,
        dyn_model=None,
        dyn_ensemble_params=None,   # stacked pytree, leading axis = members
    ):
        self.cfg = config
        self.sys = hopper_model.make_hopper(heavy_head=False)
        from simgan_tpu.physics.engine import PhysicsConfig

        # canonical floor: plane at z=0.05 (reference:165-167)
        from simgan_tpu.physics.contact import ContactConfig

        self.phys_cfg = PhysicsConfig(
            base_pos=hopper_model.BASE_INIT_POS,
            spd_pallas=config.spd_pallas,
            contact=ContactConfig(
                solver=config.solver, iterations=config.solver_iterations,
                warm_start=config.solver_warm_start))

        if config.train_dyn:
            assert behavior_model is not None and behavior_params is not None
            if config.behavior_logstd is not None:
                behavior_params = networks.reset_logstd(
                    behavior_model, behavior_params, config.behavior_logstd)
            self.obs_dim = OBS_DIM + ACT_DIM        # 14
            self.act_dim = DYN_ACT_DIM + (1 if config.dyn_stiffness else 0)
        else:
            assert dyn_model is not None and dyn_ensemble_params is not None
            self.obs_dim = OBS_DIM                  # 11
            self.act_dim = ACT_DIM                  # 3
        self.behavior_model = behavior_model
        self.behavior_params = (None if behavior_params is None
                                else jax.tree.map(jnp.asarray, behavior_params))
        self.dyn_model = dyn_model
        self.dyn_ensemble_params = (None if dyn_ensemble_params is None
                                    else jax.tree.map(jnp.asarray, dyn_ensemble_params))
        if dyn_ensemble_params is not None:
            self.n_ensemble = jax.tree.leaves(dyn_ensemble_params)[0].shape[0]

    # ------------------------------------------------------------------
    def _default_dp(self) -> DomainParams:
        """reset-time contact params (reference:165-178): foot d=1000 k=1
        lat=1 spin=0.1 resti=0; floor at z=0.05 lat=0.5 spin=0 resti=1 d=0 k=1."""
        sys = self.sys
        G = sys.n_geoms
        dp = DomainParams.default(sys).replace(
            max_forces=jnp.asarray(hopper_model.MAX_FORCES),
            floor_friction=jnp.asarray(0.5),
            floor_spinning_friction=jnp.asarray(0.0),
            floor_restitution=jnp.asarray(1.0),
            floor_stiffness=jnp.asarray(1e9 if self.cfg.dyn_stiffness else 1.0),
            floor_damping=jnp.asarray(0.0),
            floor_z=jnp.asarray(0.05),
            lateral_friction=jnp.ones(G),
            spinning_friction=jnp.zeros(G).at[0].set(0.1).at[1].set(0.1),
            restitution=jnp.zeros(G),
            # dyn_stiffness raises floor_stiffness to 1e9 so the series
            # combine passes the foot's per-step stiffness through; the
            # geom-side default drops 1 -> 0.5 so every geom's RESET-time
            # combined stiffness stays at the flag-off value
            # k = 1*1/(1+1) = 0.5 (feet are overwritten each control step).
            contact_stiffness=jnp.full(G, 0.5 if self.cfg.dyn_stiffness else 1.0),
            contact_damping=jnp.zeros(G).at[0].set(1000.0).at[1].set(1000.0),
        )
        return dp

    def _apply_env_action(self, dp: DomainParams, env_action) -> tuple[DomainParams, jax.Array]:
        """Write pi_dyn's contact coefficients onto the foot geoms; return
        battery levels (set_con_coeff_and_return_battery_level)."""
        lateral, spin, resti, damp, stiff, battery = contact_coeff_and_battery(
            env_action, 1, stiffness=self.cfg.dyn_stiffness,
            battery01=self.cfg.battery_prior)
        idx = jnp.asarray(hopper_model.FOOT_GEOMS)
        dp = dp.replace(
            lateral_friction=dp.lateral_friction.at[idx].set(lateral[0]),
            spinning_friction=dp.spinning_friction.at[idx].set(spin[0]),
            restitution=dp.restitution.at[idx].set(resti[0]),
            contact_damping=dp.contact_damping.at[idx].set(damp[0]),
            contact_stiffness=dp.contact_stiffness.at[idx].set(
                1.0 if stiff is None else stiff[0]),
        )
        return dp, battery

    def _robot_obs(self, phys: PhysState, ave_dx) -> jax.Array:
        q, qd = phys.q, phys.qd
        obs = jnp.concatenate([
            jnp.stack([1.3 + q[1], q[2], q[3], q[4], q[5]]),
            jnp.stack([qd[0], qd[1]]),
            0.1 * qd[2:6],
        ])
        if self.cfg.correct_obs_dx:
            obs = obs.at[5].set(ave_dx * OBS_SCALING[5])
        return obs

    def _behavior_act(self, obs11, key):
        _, action, _ = networks.policy_act(
            self.behavior_model, self.behavior_params, obs11, key, deterministic=False)
        return jnp.tanh(action)

    def _disagreement(self, env_pi_obs):
        """Ensemble disagreement: mean std across members' deterministic env
        actions (raw pre-squash space).  MOPO-style uncertainty proxy for
        pessimistic refinement (cfg.pessimism_lambda)."""
        means = jax.vmap(lambda p: networks.policy_act(
            self.dyn_model, p, env_pi_obs, deterministic=True)[1])(
            self.dyn_ensemble_params)
        return jnp.mean(jnp.std(means, axis=0))

    # ------------------------------------------------------------------
    def reset(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 5)
        dp = self._default_dp()

        noise_q = 0.02 if cfg.init_noise else 0.0
        noise_dq = 0.1 if cfg.init_noise else 0.0
        phys = PhysState(
            q=base.perturb(keys[0], jnp.zeros(6), noise_q),
            qd=base.perturb(keys[1], jnp.zeros(6), noise_dq),
        )
        phys = control_step(self.sys, dp, phys, jnp.zeros(3), self.phys_cfg, 1)

        obs11 = self._robot_obs(phys, jnp.asarray(0.0))
        if cfg.obs_noise:
            obs11 = base.perturb(keys[2], obs11, 0.1)
        past_obs = base.fill_window(obs11)

        if cfg.train_dyn:
            b_act = self._behavior_act(obs11, keys[3])
            past_bact = base.fill_window(b_act)
            out_obs = jnp.concatenate([obs11, b_act])
        else:
            past_bact = jnp.zeros((base.WINDOW, ACT_DIM))
            out_obs = obs11

        state = HopperCombinedState(
            phys=phys, dp=dp, past_obs=past_obs, past_bact=past_bact,
            obs=out_obs,
            timer=jnp.asarray(0, jnp.int32),
            step_count=jnp.asarray(0, jnp.int32),
            key=keys[4],
        )
        return state, out_obs

    def step(self, state: HopperCombinedState, a) -> Step:
        cfg = self.cfg
        keys = jax.random.split(state.key, 6)

        past_bact = state.past_bact
        if cfg.train_dyn:
            env_action = a
            robo_action = past_bact[0]
        else:
            robo_action = jnp.tanh(a)
            past_bact = base.push_window(past_bact, robo_action,
                                         jnp.asarray(False))
            env_pi_obs = jnp.concatenate([state.past_obs[0], robo_action])
            # ensemble member sampling per control step (reference:211-216)
            idx = jax.random.randint(keys[0], (), 0, self.n_ensemble)
            member = jax.tree.map(lambda p: p[idx], self.dyn_ensemble_params)
            _, env_action, _ = networks.policy_act(
                self.dyn_model, member, env_pi_obs, keys[1], deterministic=False)
            if cfg.pessimism_lambda:
                pess_pen = self._disagreement(env_pi_obs)

        if cfg.act_noise:
            robo_action = base.perturb(keys[2], robo_action, 0.05)

        window_obs = state.past_obs
        window_act = past_bact

        dq_old = state.phys.qd[3:6]
        x_old = state.phys.q[0]

        dp, battery = self._apply_env_action(state.dp, env_action)
        torque = robo_action * battery * dp.max_forces
        phys = control_step(self.sys, dp, state.phys, torque,
                            self.phys_cfg, cfg.control_skip)

        dt_ctrl = cfg.control_skip * self.phys_cfg.dt
        ave_dx = (phys.q[0] - x_old) / dt_ctrl

        obs11 = self._robot_obs(phys, ave_dx)
        if cfg.obs_noise:
            obs11 = base.perturb(keys[3], obs11, 0.1)
        past_obs = base.push_window(state.past_obs, obs11, jnp.asarray(False))

        if cfg.train_dyn:
            b_act = self._behavior_act(obs11, keys[4])
            past_bact = base.push_window(past_bact, b_act, jnp.asarray(False))
            out_obs = jnp.concatenate([obs11, b_act])
        else:
            out_obs = obs11

        # --- reward (reference:240-266): uses past_obs[0] (pre-latency) and
        # the tanh'd robo_action for the energy term ---
        obs_unnorm = past_obs[0] / OBS_SCALING
        reward = 3.0 + ave_dx - 0.5 * jnp.sum(jnp.square(robo_action))
        reward = reward - 3.0 * base.joints_at_limit_count(obs_unnorm[2:5], CTRL_LL, CTRL_UL)
        dq = obs_unnorm[8:11]
        reward = reward - jnp.minimum(jnp.sum(jnp.abs(dq - dq_old)) * 0.05, 5.0)
        if cfg.pessimism_lambda and not cfg.train_dyn:
            reward = reward - cfg.pessimism_lambda * pess_pen

        height = obs_unnorm[0]
        not_done = jnp.all(jnp.abs(dq) < 50.0) & (height > 0.6) & (height < 1.8)
        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_episode_steps
        done = (~not_done) | truncated

        window = SasWindow(obs=window_obs, act=window_act, next_obs=past_obs[0])
        new_state = HopperCombinedState(
            phys=phys, dp=state.dp, past_obs=past_obs, past_bact=past_bact,
            obs=out_obs,
            timer=state.timer + cfg.control_skip,
            step_count=step_count,
            key=keys[5],
        )
        metrics = {"x": phys.q[0], "ave_dx": ave_dx}
        return Step(new_state, out_obs, reward, done, truncated, window, metrics)
