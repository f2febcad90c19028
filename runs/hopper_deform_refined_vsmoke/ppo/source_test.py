class HopperEnv:
    obs_dim = OBS_DIM
    act_dim = ACT_DIM

    def __init__(self, config: HopperConfig = HopperConfig()):
        self.cfg = config
        self.sys = hopper_model.make_hopper(heavy_head=config.heavy_head_env)
        from simgan_tpu.physics.contact import ContactConfig

        deform = None
        if config.deform_floor_env and config.deform_nodes:
            from simgan_tpu.physics.deformable import DeformableConfig

            # hopper_env_v3.py:143-149: k=1500, d=50, mass=20, cube scale 20
            deform = DeformableConfig(k=1500.0, d=50.0, mass=20.0)
        self.phys_cfg = PhysicsConfig(
            base_pos=hopper_model.BASE_INIT_POS,
            contact=ContactConfig(combine="floor" if config.deform_floor_env else "bullet",
                                  solver=config.solver,
                                  iterations=config.solver_iterations,
                                  warm_start=config.solver_warm_start),
            deform=deform,
        )

    # -- domain parameter setup (reset-time changeDynamics calls) ----------
    def _domain_params(self, key) -> tuple[DomainParams, jax.Array, jax.Array]:
        cfg = self.cfg
        sys = self.sys
        G = sys.n_geoms
        dp = DomainParams.default(sys)
        dp = dp.replace(max_forces=jnp.asarray(hopper_model.MAX_FORCES))
        act_latency = jnp.asarray(0.0)
        obs_latency = jnp.asarray(0.0)

        if cfg.soft_floor_env:
            # hopper_env_v3.py:124-133
            dp = dp.replace(
                floor_friction=jnp.asarray(0.8), floor_restitution=jnp.asarray(0.5),
                floor_stiffness=jnp.asarray(600.0), floor_damping=jnp.asarray(100.0),
                contact_stiffness=jnp.full(G, 600.0), contact_damping=jnp.full(G, 100.0),
                lateral_friction=jnp.ones(G).at[0].set(1.0).at[1].set(1.0),
                floor_z=jnp.asarray(0.0),
            )
        elif cfg.deform_floor_env:
            # hopper_env_v3.py:134-149: plane at -10.1 + soft mattress
            # (cube_fat scale 20 at [7,0,-5.05] => top surface z=-0.05),
            # mass-spring stiffness 1500 / damping 50, friction 1.0.
            if cfg.deform_nodes:
                # vertex field carries the compliance (k/d live in the field
                # update); the foot<->surface row itself is near-rigid, like
                # Bullet's deformable rigid-contact solve
                from simgan_tpu.physics.contact import HARD_D, HARD_K

                dp = dp.replace(
                    floor_friction=jnp.asarray(1.0),
                    floor_restitution=jnp.asarray(0.0),
                    floor_stiffness=jnp.asarray(HARD_K),
                    floor_damping=jnp.asarray(HARD_D),
                    floor_z=jnp.asarray(-0.05),
                )
            else:
                dp = dp.replace(
                    floor_friction=jnp.asarray(1.0), floor_restitution=jnp.asarray(0.0),
                    floor_stiffness=jnp.asarray(1500.0), floor_damping=jnp.asarray(50.0),
                    floor_z=jnp.asarray(-0.05),
                )
            if cfg.finite_mattress:
                # backup plane at z=-10.10, lateralFriction 100
                # (hopper_env_v3.py:134-139)
                dp = dp.replace(
                    mattress_x=jnp.asarray([-3.0, 17.0]),
                    mattress_y=jnp.asarray([-10.0, 10.0]),
                    hard_floor_z=jnp.asarray(-10.10),
                    hard_floor_friction=jnp.asarray(100.0),
                )
        else:
            # source env (hopper_env_v3.py:150-177)
            if cfg.randomization_train:
                keys = jax.random.split(key, 10)
                mass_scale = jax.random.uniform(keys[0], (4,), minval=0.5, maxval=1.5)
                inertia_scale = jax.random.uniform(keys[1], (4,), minval=0.4, maxval=1.8)
                power = jax.random.uniform(keys[2], (3,), minval=0.5, maxval=1.5)
                jdamp = jax.random.uniform(keys[3], (3,), minval=0.2, maxval=3.0)
                act_latency = jax.random.uniform(keys[4], (), minval=0.0, maxval=0.02)
                obs_latency = jax.random.uniform(keys[5], (), minval=0.0, maxval=0.02)
                fric = jax.random.uniform(keys[6], (), minval=0.4, maxval=1.5)
                resti = jax.random.uniform(keys[7], (), minval=0.0, maxval=1.5)
                if cfg.randomization_train_addi:
                    damp = jnp.power(10.0, jax.random.uniform(keys[8], (), minval=1.2, maxval=3.2))
                    spinfric = jax.random.uniform(keys[9], (), minval=0.0, maxval=0.2)
                else:
                    damp = jnp.asarray(2000.0)
                    spinfric = jnp.asarray(0.0)
                # mass/inertia scaling applies to links torso..foot (=dofs 2..5,
                # hopper.py:181-190); joint damping on ctrl joints
                ms = jnp.ones(sys.n_links).at[3:7].set(mass_scale)
                isc = jnp.ones(sys.n_links).at[3:7].set(inertia_scale)
                jd = jnp.asarray(sys.joint_damping).at[4:7].set(jdamp)
                dp = dp.replace(
                    mass_scale=ms, inertia_scale=isc,
                    joint_damping=jd,
                    max_forces=jnp.asarray(hopper_model.MAX_FORCES) * power,
                )
            else:
                fric = jnp.asarray(0.8)
                resti = jnp.asarray(0.5)
                damp = jnp.asarray(2000.0)
                spinfric = jnp.asarray(0.0)
            dp = dp.replace(
                floor_friction=fric, floor_restitution=resti,
                floor_stiffness=jnp.asarray(1.0), floor_damping=damp,
                floor_spinning_friction=spinfric,
                # foot link contact reset (hopper_env_v3.py:174-177):
                # lateralFriction 1.0, restitution 1.0, k=1.0, d=0.0
                lateral_friction=jnp.ones(G),
                restitution=jnp.zeros(G).at[0].set(1.0).at[1].set(1.0),
                contact_stiffness=jnp.ones(G),
                contact_damping=jnp.zeros(G),
            )

        if cfg.low_power_env:
            # foot max force 200 -> 100 (hopper_env_v3.py:179-180)
            dp = dp.replace(max_forces=dp.max_forces.at[2].set(100.0))
        return dp, act_latency, obs_latency

    # -- obs construction ---------------------------------------------------
    def _robot_obs(self, phys: PhysState, ave_dx) -> jax.Array:
        """hopper.get_robot_observation + dx correction (hopper.py:151-175,
        hopper_env_v3.py:294-299): [height, q2..q5, dx, dz, 0.1*dq(2:6)]."""
        q, qd = phys.q, phys.qd
        height = 1.3 + q[1]
        obs = jnp.concatenate([
            jnp.stack([height, q[2], q[3], q[4], q[5]]),
            jnp.stack([qd[0], qd[1]]),
            0.1 * qd[2:6],
        ])
        if self.cfg.correct_obs_dx:
            obs = obs.at[5].set(ave_dx * OBS_SCALING[5])
        return obs

    # -- API ---------------------------------------------------------------
    def reset(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 5)
        dp, act_lat, obs_lat = self._domain_params(keys[0])

        noise_q = 0.02 if cfg.init_noise else 0.0
        noise_dq = 0.1 if cfg.init_noise else 0.0
        q = base.perturb(keys[1], jnp.zeros(6), noise_q)
        qd = base.perturb(keys[2], jnp.zeros(6), noise_dq)
        if self.phys_cfg.deform is not None:
            from simgan_tpu.physics import deformable

            fu, fv = deformable.rest_state()
            phys = PhysState(q=q, qd=qd, field_u=fu, field_v=fv)
        else:
            phys = PhysState(q=q, qd=qd)

        # reference does one stepSimulation during reset (hopper_env_v3.py:184)
        phys = control_step(self.sys, dp, phys, jnp.zeros(3), self.phys_cfg, 1)

        obs = self._robot_obs(phys, jnp.asarray(0.0))
        if cfg.obs_noise:
            obs = base.perturb(keys[3], obs, 0.1)
        past_obs = base.fill_window(obs)
        out_obs = base.latency_interp(past_obs, obs_lat)

        state = HopperState(
            phys=phys, dp=dp,
            past_obs=past_obs,
            past_act=jnp.zeros((base.WINDOW, ACT_DIM)),
            act_empty=jnp.asarray(True),
            obs=out_obs,
            act_latency=act_lat, obs_latency=obs_lat,
            timer=jnp.asarray(0, jnp.int32),
            step_count=jnp.asarray(0, jnp.int32),
            key=keys[4],
        )
        return state, out_obs

    def step(self, state: HopperState, a) -> Step:
        cfg = self.cfg
        keys = jax.random.split(state.key, 4)

        act = jnp.tanh(a)
        past_act = base.push_window(state.past_act, act, state.act_empty)
        window_obs = state.past_obs
        window_act = past_act

        # act latency interpolation (hopper_env_v3.py:227-231)
        a_used = base.latency_interp(past_act, state.act_latency)
        if cfg.act_noise:
            a_used = base.perturb(keys[0], a_used, 0.05)
        if cfg.emf_power_env:
            # torque derating by joint speed (hopper_env_v3.py:236-239)
            ratio = jnp.clip(1.0 - state.phys.qd[3:6] / 10.0, 0.0, 1.0)
            a_used = a_used * ratio

        dq_old = state.phys.qd[3:6]
        x_old = state.phys.q[0]

        torque = a_used * state.dp.max_forces
        phys = control_step(self.sys, state.dp, state.phys, torque,
                            self.phys_cfg, cfg.control_skip)

        dt_ctrl = cfg.control_skip * self.phys_cfg.dt
        ave_dx = (phys.q[0] - x_old) / dt_ctrl

        obs = self._robot_obs(phys, ave_dx)
        if cfg.obs_noise:
            obs = base.perturb(keys[1], obs, 0.1)
        past_obs = base.push_window(state.past_obs, obs, jnp.asarray(False))
        out_obs = base.latency_interp(past_obs, state.obs_latency)

        # --- reward (hopper_env_v3.py:255-272) ---
        obs_unnorm = out_obs / OBS_SCALING
        reward = 3.0 + ave_dx
        reward = reward - 0.5 * jnp.sum(jnp.square(a))      # raw (pre-tanh) action
        q_ctrl = obs_unnorm[2:5]
        reward = reward - 3.0 * base.joints_at_limit_count(q_ctrl, CTRL_LL, CTRL_UL)
        dq = obs_unnorm[8:11]
        reward = reward - jnp.minimum(jnp.sum(jnp.abs(dq - dq_old)) * cfg.acc_pen_weight, 5.0)

        height = obs_unnorm[0]
        not_done = jnp.all(jnp.abs(dq) < 50.0) & (height > 0.6) & (height < 1.8)
        terminal = ~not_done
        step_count = state.step_count + 1
        truncated = step_count >= cfg.max_episode_steps
        done = terminal | truncated

        window = SasWindow(obs=window_obs, act=window_act, next_obs=past_obs[0])

        new_state = HopperState(
            phys=phys, dp=state.dp,
            past_obs=past_obs, past_act=past_act,
            act_empty=jnp.asarray(False),
            obs=out_obs,
            act_latency=state.act_latency, obs_latency=state.obs_latency,
            timer=state.timer + cfg.control_skip,
            step_count=step_count,
            key=keys[3],
        )
        metrics = {"x": phys.q[0], "ave_dx": ave_dx}
        return Step(new_state, out_obs, reward, done, truncated, window, metrics)
