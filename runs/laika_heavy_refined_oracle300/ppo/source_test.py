class LaikagoEnv:
    obs_dim = OBS_DIM
    act_dim = ACT_DIM
    robot_obs_dim = ROBOT_OBS_DIM

    def __init__(self, config: LaikagoConfig = LaikagoConfig()):
        self.cfg = config
        self.sys = laika_model.make_laikago(heavy_leg=config.heavy_leg_env)
        deform = None
        if config.deform_floor_env and config.deform_nodes:
            from simgan_tpu.physics.deformable import DeformableConfig

            # laikago_env_v4.py:177-183: k=60000, d=150, mass=4000, scale 20
            deform = DeformableConfig(k=60000.0, d=150.0, mass=4000.0)
        self.phys_cfg = PhysicsConfig(
            contact=ContactConfig(combine="floor" if config.deform_floor_env else "bullet",
                                  solver=config.solver,
                                  iterations=config.solver_iterations,
                                  warm_start=config.solver_warm_start),
            deform=deform,
        )

    # -- domain parameters (reset-time changeDynamics) ----------------------
    def _domain_params(self, key):
        cfg = self.cfg
        sys = self.sys
        G = sys.n_geoms
        dp = DomainParams.default(sys).replace(
            max_forces=jnp.asarray(laika_model.MAX_FORCES),
            lateral_friction=jnp.full(G, 0.5),  # pybullet default for non-feet
        )
        act_latency = jnp.asarray(0.0)
        obs_latency = jnp.asarray(0.0)
        toe = list(laika_model.TOE_GEOMS)

        if cfg.soft_floor_env:
            # laikago_env_v4.py:163-171: feet k=100 d=100, floor k=100 d=50
            dp = dp.replace(
                floor_friction=jnp.asarray(0.5), floor_restitution=jnp.asarray(0.0),
                floor_stiffness=jnp.asarray(100.0), floor_damping=jnp.asarray(50.0),
                contact_stiffness=jnp.ones(G).at[jnp.asarray(toe)].set(100.0),
                contact_damping=jnp.zeros(G).at[jnp.asarray(toe)].set(100.0),
            )
        elif cfg.deform_floor_env:
            # laikago_env_v4.py:172-183: mattress top at z=0 (cube_fat scale 20
            # at [7,0,-5]), mass-spring stiffness 60000 / damping 150, fric 1.0
            if cfg.deform_nodes:
                # vertex field carries the compliance; the toe<->surface row
                # is near-rigid like Bullet's deformable rigid-contact solve
                from simgan_tpu.physics.contact import HARD_D, HARD_K

                dp = dp.replace(
                    floor_friction=jnp.asarray(1.0),
                    floor_restitution=jnp.asarray(0.0),
                    floor_stiffness=jnp.asarray(HARD_K),
                    floor_damping=jnp.asarray(HARD_D),
                    floor_z=jnp.asarray(0.0),
                )
            else:
                dp = dp.replace(
                    floor_friction=jnp.asarray(1.0), floor_restitution=jnp.asarray(0.0),
                    floor_stiffness=jnp.asarray(60000.0), floor_damping=jnp.asarray(150.0),
                    floor_z=jnp.asarray(0.0),
                )
            if cfg.finite_mattress:
                # backup plane at z=-10.02, friction left at the pybullet
                # default 0.5 (laikago_env_v4.py:172-176)
                dp = dp.replace(
                    mattress_x=jnp.asarray([-3.0, 17.0]),
                    mattress_y=jnp.asarray([-10.0, 10.0]),
                    hard_floor_z=jnp.asarray(-10.02),
                    hard_floor_friction=jnp.asarray(0.5),
                )
        else:
            if cfg.randomization_train:
                keys = jax.random.split(key, 10)
                mass_scale = jax.random.uniform(keys[0], (13,), minval=0.8, maxval=1.2)
                inertia_scale = jax.random.uniform(keys[1], (13,), minval=0.5, maxval=1.5)
                power = jax.random.uniform(keys[2], (12,), minval=0.8, maxval=1.2)
                jdamp = jax.random.uniform(keys[3], (12,), minval=0.2, maxval=2.0)
                act_latency = jax.random.uniform(keys[4], (), minval=0.0, maxval=0.02)
                obs_latency = jax.random.uniform(keys[5], (), minval=0.0, maxval=0.02)
                fric = jax.random.uniform(keys[6], (), minval=0.4, maxval=1.25)
                resti = jax.random.uniform(keys[7], (), minval=0.0, maxval=0.5)
                if cfg.randomization_train_addi:
                    damp = jnp.power(10.0, jax.random.uniform(keys[8], (), minval=2.0, maxval=3.2))
                    spinfric = jax.random.uniform(keys[9], (), minval=0.0, maxval=0.1)
                else:
                    damp = jnp.asarray(2000.0)
                    spinfric = jnp.asarray(0.0)
                # links [-1]+ctrl_dofs (laikago.py:420-430): base + 12 moving
                dp = dp.replace(
                    mass_scale=jnp.concatenate([mass_scale[:1], mass_scale[1:]]),
                    inertia_scale=jnp.concatenate([inertia_scale[:1], inertia_scale[1:]]),
                    joint_damping=jnp.concatenate([jnp.zeros(1), jdamp]),
                    max_forces=jnp.asarray(laika_model.MAX_FORCES) * power,
                )
            else:
                fric = jnp.asarray(0.5)
                resti = jnp.asarray(0.0)
                damp = jnp.asarray(2000.0)
                spinfric = jnp.asarray(0.0)
            # feet reset (laikago_env_v4.py:203-211): lat 1.0, resti 1.0,
            # k=1.0, d=0.0, spin 0.0; floor: fric/resti/k=1/d/spinfric
            dp = dp.replace(
                floor_friction=fric, floor_restitution=resti,
                floor_stiffness=jnp.asarray(1.0), floor_damping=damp,
                floor_spinning_friction=spinfric,
                lateral_friction=dp.lateral_friction.at[jnp.asarray(toe)].set(1.0),
                restitution=jnp.zeros(G).at[jnp.asarray(toe)].set(1.0),
                contact_stiffness=jnp.ones(G),
                contact_damping=jnp.zeros(G),
            )

        if cfg.low_power_env:
            # deprecated variant (laikago_env_v4.py:219-221)
            dp = dp.replace(max_forces=jnp.asarray([30.0] * 3 + [15.0] * 3 + [30.0] * 6))
        return dp, act_latency, obs_latency

    # -- observation --------------------------------------------------------
    def robot_obs(self, phys: PhysState, with_vel: bool = False) -> jax.Array:
        """laikago.get_robot_observation (laikago.py:356-399)."""
        kin, com, v_com, omega = base_com_and_vel(self.sys, phys)
        rotmat = maths.quat_to_mat(phys.q[3:7]).reshape(9)
        q_joints = phys.q[7:]
        toe_pos, _ = geom_world(self.sys, kin)
        feet = [toe_pos[g] - com for g in laika_model.TOE_GEOMS]
        obs = jnp.concatenate([
            com[2:3], rotmat, v_com, q_joints, jnp.concatenate(feet),
        ])
        if with_vel:
            obs = jnp.concatenate([
                obs,
                laika_model.OBS_SCALE_ANGVEL * omega,
                laika_model.OBS_SCALE_DQ * phys.qd[6:],
            ])
        return obs

    def _stacked_obs(self, past_obs, past_act, obs_latency):
        """Frame-stacked behavior obs t-{0,4,8} with latency interpolation
        (laikago_env_v4.py:387-413, utils.select_and_merge_from_s_a)."""
        del past_act  # actions are not stacked into behavior obs (a_idx=[])
        s0 = jnp.concatenate([past_obs[i] for i in BEHAVIOR_OBS_T_IDX])
        s1 = jnp.concatenate([past_obs[i + 1] for i in BEHAVIOR_OBS_T_IDX])
        interp = obs_latency / 0.02
        return s0 * (1.0 - interp) + s1 * interp

    # -- API ----------------------------------------------------------------
    def reset(self, key):
        cfg = self.cfg
        sys = self.sys
        keys = jax.random.split(key, 8)
        dp, act_lat, obs_lat = self._domain_params(keys[0])

        # perturbed base state (laikago.py:140-154); velocities zero when
        # collecting sysid data (no_init_vel)
        vel_r = 0.0 if cfg.sysid_data_collection else 0.2
        if cfg.init_noise:
            com_pos = base.perturb(keys[1], jnp.asarray(laika_model.BASE_INIT_POS), 0.03)
            euler = base.perturb(keys[2], jnp.asarray(laika_model.BASE_INIT_EULER), 0.1)
            base_vel = base.perturb(keys[3], jnp.zeros(6), vel_r)
            jq = base.perturb(keys[4], INIT_Q, 0.01)
            jdq = base.perturb(keys[5], jnp.zeros(12), 0.0 if cfg.sysid_data_collection else 0.1)
        else:
            com_pos = jnp.asarray(laika_model.BASE_INIT_POS)
            euler = jnp.asarray(laika_model.BASE_INIT_EULER)
            base_vel = jnp.zeros(6)
            jq = INIT_Q
            jdq = jnp.zeros(12)

        quat = maths.quat_from_euler(euler)
        # convert COM pose/velocity to link-frame-origin state
        origin = com_pos - maths.quat_rotate(quat, sys.com[0])
        omega = base_vel[3:6]
        r = maths.quat_rotate(quat, sys.com[0])
        v_origin = base_vel[0:3] - jnp.cross(omega, r)

        q = jnp.concatenate([origin, quat, jq])
        qd = jnp.concatenate([v_origin, omega, jdq])
        if self.phys_cfg.deform is not None:
            from simgan_tpu.physics import deformable

            fu, fv = deformable.rest_state()
            phys = PhysState(q=q, qd=qd, field_u=fu, field_v=fv)
        else:
            phys = PhysState(q=q, qd=qd)

        if not cfg.sysid_data_collection:
            # one stepSimulation during reset (laikago_env_v4.py:223-224)
            phys = control_step(sys, dp, phys, jnp.zeros(12), self.phys_cfg, 1)

        obs37 = self.robot_obs(phys)
        if cfg.obs_noise:
            obs37 = base.perturb(keys[6], obs37, 0.1)
        past_obs = base.fill_window(obs37)
        out_obs = self._stacked_obs(past_obs, None, obs_lat)

        state = LaikagoState(
            phys=phys, dp=dp,
            past_obs=past_obs,
            past_act=jnp.zeros((base.WINDOW, ACT_DIM)),
            act_empty=jnp.asarray(True),
            act_latency=act_lat, obs_latency=obs_lat,
            timer=jnp.asarray(0, jnp.int32),
            step_count=jnp.asarray(0, jnp.int32),
            key=keys[7],
        )
        return state, out_obs

    def step(self, state: LaikagoState, a) -> Step:
        cfg = self.cfg
        sys = self.sys
        keys = jax.random.split(state.key, 5)

        kin0, com0, _, _ = base_com_and_vel(sys, state.phys)
        x_0 = com0[0]

        # act-range enlargement + tanh (laikago_env_v4.py:273-274)
        a_t = jnp.tanh(base.perturb(keys[0], a, cfg.enlarge_act_range))
        past_act = base.push_window(state.past_act, a_t, state.act_empty)
        window_obs = state.past_obs
        window_act = past_act

        a_used = base.latency_interp(past_act, state.act_latency)
        if cfg.act_noise:
            a_used = base.perturb(keys[1], a_used, 0.05)
        if cfg.emf_power_env or cfg.sysid_data_collection:
            ratio = jnp.clip(1.0 - state.phys.qd[6:] / 15.0, 0.0, 1.0)
            a_used = a_used * ratio

        dq_old = state.phys.qd[6:]

        ext = None
        if cfg.randomforce_train:
            # +-80 N random push on each toe every substep
            # (laikago_env_v4.py:303-315)
            ext = jnp.zeros((cfg.control_skip, sys.n_geoms, 3))
            f = jax.random.uniform(
                keys[2], (cfg.control_skip, 4, 3), minval=-80.0, maxval=80.0)
            ext = ext.at[:, jnp.asarray(laika_model.TOE_GEOMS), :].set(f)

        torque = a_used * state.dp.max_forces
        phys = control_step(sys, state.dp, state.phys, torque, self.phys_cfg,
                            cfg.control_skip, ext_forces=ext)
        timer = state.timer + cfg.control_skip

        kin1, com1, _, _ = base_com_and_vel(sys, phys)
        dt_ctrl = cfg.control_skip * self.phys_cfg.dt
        velx = (com1[0] - x_0) / dt_ctrl

        q, dq = phys.q[7:], phys.qd[6:]

        # --- reward (laikago_env_v4.py:327-348) ---
        reward = cfg.ab
        tar = jnp.minimum(timer.astype(jnp.float32) / 500.0, cfg.max_tar_vel)
        reward = reward + jnp.minimum(velx, tar) * cfg.vel_r_weight
        reward = reward - cfg.energy_weight * jnp.sum(jnp.square(a_used))
        reward = reward - cfg.jl_weight * base.joints_at_limit_count(q, CTRL_LL, CTRL_UL)
        reward = reward - jnp.minimum(jnp.sum(jnp.abs(dq - dq_old)) * cfg.acc_pen_weight, 5.0)
        reward = reward - jnp.minimum(
            jnp.sum(jnp.square(q - INIT_Q) * Q_PEN_WEIGHTS) * cfg.q_pen_weight, 5.0)
        reward = reward - com1[1] * 0.5

        obs37 = self.robot_obs(phys)
        if cfg.obs_noise:
            obs37 = base.perturb(keys[3], obs37, 0.1)
        past_obs = base.push_window(state.past_obs, obs37, jnp.asarray(False))
        out_obs = self._stacked_obs(past_obs, None, state.obs_latency)

        # --- termination (laikago_env_v4.py:353-368) ---
        rpy = maths.quat_to_euler(phys.q[3:7])
        diff = rpy - TARGET_RPY
        if cfg.final_test:
            diff = jnp.zeros_like(diff)
        height = com1[2]
        height_thres = 0.15 if cfg.final_test else 0.3
        not_done = (
            jnp.all(jnp.abs(dq) < 90.0)
            & (height > height_thres)
            & jnp.all(jnp.abs(diff) < 1.2)
        )
        terminal = ~not_done
        if cfg.final_test:
            terminal = terminal | (timer >= 3500)
        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_episode_steps
        done = terminal | truncated

        window = SasWindow(obs=window_obs, act=window_act, next_obs=past_obs[0])
        new_state = LaikagoState(
            phys=phys, dp=state.dp,
            past_obs=past_obs, past_act=past_act,
            act_empty=jnp.asarray(False),
            act_latency=state.act_latency, obs_latency=state.obs_latency,
            timer=timer, step_count=step_count,
            key=keys[4],
        )
        metrics = {"x": com1[0], "velx": velx}
        return Step(new_state, out_obs, reward, done, truncated, window, metrics)
