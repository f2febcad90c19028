class LaikagoCombinedEnv:
    act_dim_robot = ACT_DIM
    robot_obs_dim = ROBOT_OBS_DIM

    def __init__(
        self,
        config: LaikagoCombinedConfig = LaikagoCombinedConfig(),
        behavior_model=None,
        behavior_params=None,
        dyn_model=None,
        dyn_ensemble_params=None,
    ):
        self.cfg = config
        self.sys = laika_model.make_laikago(heavy_leg=False)
        from simgan_tpu.physics.contact import ContactConfig

        self.phys_cfg = PhysicsConfig(
            spd_pallas=config.spd_pallas,
            contact=ContactConfig(
                solver=config.solver, iterations=config.solver_iterations,
                warm_start=config.solver_warm_start))
        self._inner = LaikagoEnv.__new__(LaikagoEnv)  # reuse obs builders
        self._inner.cfg = LaikagoConfig()
        self._inner.sys = self.sys
        self._inner.phys_cfg = self.phys_cfg

        if config.train_dyn:
            assert behavior_model is not None and behavior_params is not None
            if config.behavior_logstd is not None:
                behavior_params = networks.reset_logstd(
                    behavior_model, behavior_params, config.behavior_logstd)
            self.obs_dim = DYN_OBS_DIM     # 64
            self.act_dim = DYN_ACT_DIM + (4 if config.dyn_stiffness else 0)
        else:
            assert dyn_model is not None and dyn_ensemble_params is not None
            self.obs_dim = OBS_DIM         # 111
            self.act_dim = ACT_DIM         # 12
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
        """Feet reset (reference:213-219): d=1000 k=1 lat=1 spin=0.1 resti=0;
        floor: lat=0.5 spin=0 resti=1 d=0 k=1."""
        sys = self.sys
        G = sys.n_geoms
        toe = jnp.asarray(laika_model.TOE_GEOMS)
        return DomainParams.default(sys).replace(
            max_forces=jnp.asarray(laika_model.MAX_FORCES),
            floor_friction=jnp.asarray(0.5),
            floor_spinning_friction=jnp.asarray(0.0),
            floor_restitution=jnp.asarray(1.0),
            floor_stiffness=jnp.asarray(1e9 if self.cfg.dyn_stiffness else 1.0),
            floor_damping=jnp.asarray(0.0),
            floor_z=jnp.asarray(0.0),
            lateral_friction=jnp.full(G, 0.5).at[toe].set(1.0),
            spinning_friction=jnp.zeros(G).at[toe].set(0.1),
            restitution=jnp.zeros(G),
            # see hopper_combined._default_dp: with dyn_stiffness the floor
            # passes the geom value through (floor k=1e9), so the geom-side
            # default is 0.5 to keep non-toe (and reset-time toe) combined
            # stiffness at the flag-off 0.5
            contact_stiffness=jnp.full(G, 0.5 if self.cfg.dyn_stiffness else 1.0),
            contact_damping=jnp.zeros(G).at[toe].set(1000.0),
        )

    def _apply_env_action(self, dp: DomainParams, env_action):
        lateral, spin, resti, damp, stiff, battery = contact_coeff_and_battery(
            env_action, 4, stiffness=self.cfg.dyn_stiffness,
            battery01=self.cfg.battery_prior)
        toe = jnp.asarray(laika_model.TOE_GEOMS)
        dp = dp.replace(
            lateral_friction=dp.lateral_friction.at[toe].set(lateral),
            spinning_friction=dp.spinning_friction.at[toe].set(spin),
            restitution=dp.restitution.at[toe].set(resti),
            contact_damping=dp.contact_damping.at[toe].set(damp),
            contact_stiffness=dp.contact_stiffness.at[toe].set(
                1.0 if stiff is None else stiff),
        )
        return dp, battery

    def _behavior_act(self, b_obs, key):
        _, action, _ = networks.policy_act(
            self.behavior_model, self.behavior_params, b_obs, key, deterministic=False)
        return jnp.tanh(action)

    def _disagreement(self, env_pi_obs):
        """Ensemble disagreement: mean std across members' deterministic env
        actions (raw pre-squash space — scale-uniform across the contact-
        coefficient and battery dims).  MOPO-style uncertainty proxy: large
        where the refined policy has left the distribution the ensemble was
        identified on."""
        means = jax.vmap(lambda p: networks.policy_act(
            self.dyn_model, p, env_pi_obs, deterministic=True)[1])(
            self.dyn_ensemble_params)
        return jnp.mean(jnp.std(means, axis=0))

    def _stacked_obs(self, past_obs):
        return jnp.concatenate([past_obs[i] for i in (0, 4, 8)])

    # ------------------------------------------------------------------
    def reset(self, key):
        cfg = self.cfg
        sys = self.sys
        from simgan_tpu.core import maths

        keys = jax.random.split(key, 9)
        dp = self._default_dp()

        vel_r = 0.2
        if cfg.init_noise:
            com_pos = base.perturb(keys[0], jnp.asarray(laika_model.BASE_INIT_POS), 0.03)
            euler = base.perturb(keys[1], jnp.asarray(laika_model.BASE_INIT_EULER), 0.1)
            base_vel = base.perturb(keys[2], jnp.zeros(6), vel_r)
            jq = base.perturb(keys[3], INIT_Q, 0.01)
            jdq = base.perturb(keys[4], jnp.zeros(12), 0.1)
        else:
            com_pos = jnp.asarray(laika_model.BASE_INIT_POS)
            euler = jnp.asarray(laika_model.BASE_INIT_EULER)
            base_vel = jnp.zeros(6)
            jq = INIT_Q
            jdq = jnp.zeros(12)

        quat = maths.quat_from_euler(euler)
        origin = com_pos - maths.quat_rotate(quat, sys.com[0])
        omega = base_vel[3:6]
        v_origin = base_vel[0:3] - jnp.cross(omega, maths.quat_rotate(quat, sys.com[0]))
        phys = PhysState(
            q=jnp.concatenate([origin, quat, jq]),
            qd=jnp.concatenate([v_origin, omega, jdq]),
        )
        phys = control_step(sys, dp, phys, jnp.zeros(12), self.phys_cfg, 1)

        obs37 = self._inner.robot_obs(phys)
        if cfg.obs_noise:
            obs37 = base.perturb(keys[5], obs37, 0.1)
        past_obs = base.fill_window(obs37)

        if cfg.train_dyn:
            b_obs = self._stacked_obs(past_obs)
            b_act = self._behavior_act(b_obs, keys[6])
            past_bact = base.fill_window(b_act)
            obs_w_dq = self._inner.robot_obs(phys, with_vel=True)
            out_obs = jnp.concatenate([obs_w_dq, b_act])
        else:
            past_bact = jnp.zeros((base.WINDOW, ACT_DIM))
            out_obs = self._stacked_obs(past_obs)

        state = LaikagoCombinedState(
            phys=phys, dp=dp, past_obs=past_obs, past_bact=past_bact,
            obs=out_obs,
            timer=jnp.asarray(0, jnp.int32),
            step_count=jnp.asarray(0, jnp.int32),
            key=keys[8],
        )
        return state, out_obs

    def step(self, state: LaikagoCombinedState, a) -> Step:
        cfg = self.cfg
        sys = self.sys
        from simgan_tpu.core import maths

        keys = jax.random.split(state.key, 6)

        past_bact = state.past_bact
        if cfg.train_dyn:
            env_action = a
            robo_action = past_bact[0]
        else:
            robo_action = jnp.tanh(a)
            past_bact = base.push_window(past_bact, robo_action, jnp.asarray(False))
            obs_w_dq = self._inner.robot_obs(state.phys, with_vel=True)
            env_pi_obs = jnp.concatenate([obs_w_dq, robo_action])
            idx = jax.random.randint(keys[0], (), 0, self.n_ensemble)
            member = jax.tree.map(lambda p: p[idx], self.dyn_ensemble_params)
            _, env_action, _ = networks.policy_act(
                self.dyn_model, member, env_pi_obs, keys[1], deterministic=False)
            if cfg.pessimism_lambda:
                pess_pen = self._disagreement(env_pi_obs)

        kin0, com0, _, _ = base_com_and_vel(sys, state.phys)
        x_0, y_0 = com0[0], com0[1]

        if cfg.act_noise:
            robo_action = base.perturb(keys[2], robo_action, 0.05)

        window_obs = state.past_obs
        window_act = past_bact
        dq_old = state.phys.qd[6:]

        dp, battery = self._apply_env_action(state.dp, env_action)
        torque = robo_action * battery * dp.max_forces
        phys = control_step(sys, dp, state.phys, torque, self.phys_cfg, cfg.control_skip)
        timer = state.timer + cfg.control_skip

        obs37 = self._inner.robot_obs(phys)
        if cfg.obs_noise:
            obs37 = base.perturb(keys[3], obs37, 0.1)
        past_obs = base.push_window(state.past_obs, obs37, jnp.asarray(False))

        if cfg.train_dyn:
            b_obs = self._stacked_obs(past_obs)
            b_act = self._behavior_act(b_obs, keys[4])
            past_bact = base.push_window(past_bact, b_act, jnp.asarray(False))
            obs_w_dq = self._inner.robot_obs(phys, with_vel=True)
            out_obs = jnp.concatenate([obs_w_dq, b_act])
        else:
            out_obs = self._stacked_obs(past_obs)

        kin1, com1, _, _ = base_com_and_vel(sys, phys)
        dt_ctrl = cfg.control_skip * self.phys_cfg.dt
        velx = (com1[0] - x_0) / dt_ctrl
        vely = (com1[1] - y_0) / dt_ctrl
        height = com1[2]
        q, dq = phys.q[7:], phys.qd[6:]

        # --- reward (reference:308-344) ---
        if cfg.pretrain_dyn:
            reward = jnp.asarray(0.0)
        else:
            reward = cfg.ab
            tar = jnp.minimum(timer.astype(jnp.float32) / 500.0, cfg.max_tar_vel)
            if cfg.task_y:
                reward = reward + jnp.minimum(vely, tar) * cfg.vel_r_weight * 1.5
            else:
                reward = reward + jnp.minimum(velx, tar) * cfg.vel_r_weight
            reward = reward - cfg.energy_weight * jnp.sum(jnp.square(robo_action))
            reward = reward - cfg.jl_weight * base.joints_at_limit_count(q, CTRL_LL, CTRL_UL)
            reward = reward - jnp.minimum(jnp.sum(jnp.abs(dq - dq_old)) * cfg.acc_pen_weight, 5.0)
            reward = reward - jnp.minimum(
                jnp.sum(jnp.square(q - INIT_Q) * Q_PEN_WEIGHTS) * cfg.q_pen_weight, 5.0)
            if cfg.task_y:
                reward = reward - jnp.abs(com1[0]) * 1.0
            else:
                reward = reward - com1[1] * 0.5
            if cfg.pessimism_lambda and not cfg.train_dyn:
                reward = reward - cfg.pessimism_lambda * pess_pen

        rpy = maths.quat_to_euler(phys.q[3:7])
        diff = rpy - TARGET_RPY
        if cfg.task_y:
            diff = diff.at[0].set(0.0)
        not_done = (
            jnp.all(jnp.abs(dq) < 90.0) & (height > 0.3) & jnp.all(jnp.abs(diff) < 1.2)
        )
        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_episode_steps
        done = (~not_done) | truncated

        window = SasWindow(obs=window_obs, act=window_act, next_obs=past_obs[0])
        new_state = LaikagoCombinedState(
            phys=phys, dp=state.dp, past_obs=past_obs, past_bact=past_bact,
            obs=out_obs,
            timer=timer, step_count=step_count,
            key=keys[5],
        )
        metrics = {"x": com1[0], "velx": velx}
        return Step(new_state, out_obs, reward, done, truncated, window, metrics)
