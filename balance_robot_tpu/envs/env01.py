"""Env01 family: balance (v1), noisy-obs balance (v2), balance-then-move (v3).

Functional JAX re-implementations of reference env01_v1.py / env01_v2.py /
env01_v3.py with exact step/reset/reward/termination semantics (SURVEY §2.7).
Randomness: the reference mixes a seeded `np_random` with the unseeded global
`np.random`; here every draw comes from the per-env JAX PRNG key carried in
EnvState, with the same distributions and call structure (one draw per
reference draw site, including the multiple noisy `get_pitch()` calls per
step in v2).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics import robot_core as rc
from ..physics.step import PhysState, control_step
from . import base
from .base import (EnvState, WHEEL_SPEED_DELTA_MAX, TERMINATE_PITCH,
                   base_reward, pitch_of,
                   scipy_euler_to_mj_quat_scrambled)


class Env01V1:
    """Plain balance env (reference env01_v1.py)."""

    id = "Env01-v1"
    obs_dim = 6
    act_dim = 2
    priv_dim = 0        # privileged critic features (see envs/env03.py)
    max_episode_steps = 6000
    reward_threshold = 6000.0
    params = rc.ENV01_PARAMS
    # reset euler ranges: x in +-pi, y/z in +-0.2 (env01_v1.py:46-49)
    reset_y_range = 0.2
    reset_z_range = 0.2

    def use_fast_solver(self):
        """Switch this instance to the training-grade constraint solver
        (physics.fast_solver: ~2x throughput, 1.5e-8 qpos parity — see
        physics/__init__.py). Parity tests / deployment keep the exact
        grade."""
        from ..physics import fast_solver
        self.params = fast_solver(self.params)
        # a cached pallas control step bakes in the params it was built
        # from — rebuild it so `use_pallas_physics().use_fast_solver()`
        # (either order) runs the solver grade self.params reports
        if (getattr(self, "_pallas_cs", None) is not None
                or getattr(self, "_pallas_cs14", None) is not None):
            self.use_pallas_physics(
                interpret=getattr(self, "_pallas_interpret", False))
        return self

    def use_pallas_physics(self, interpret=False):
        """Route the 250-substep control step through the fused pallas TPU
        kernel when this env runs under vmap (VecEnv / PPO); single-env
        calls keep the XLA path.  Flat-floor 8-dof scenes use
        physics/pallas_step.py; wall scenes (EnvMove05 corridor) use
        physics/pallas_move.py; Env03's 14-dof step overrides this with
        physics/pallas_block.py."""
        if getattr(self.params, "walls", None):
            from ..physics import pallas_move
            self._pallas_cs = pallas_move.make_vmappable_control_step_walls(
                self.params, interpret=interpret)
        else:
            from ..physics import pallas_step
            self._pallas_cs = pallas_step.make_vmappable_control_step(
                self.params, interpret=interpret)
        self._pallas_interpret = interpret
        return self

    def _control_step(self, phys, ctrl, friction):
        cs = getattr(self, "_pallas_cs", None)
        if cs is not None:
            return cs(phys, ctrl, friction)
        return control_step(phys, ctrl, self.params, friction=friction)

    # ---- noise hooks (overridden by v2/v3)
    def _pitch(self, state, qpos, key):
        return pitch_of(qpos)

    def reset(self, key):
        k1, k2, k3, k4, k5, kstate = jax.random.split(key, 6)
        qpos0 = jnp.zeros(9).at[3].set(1.0)
        qpos = qpos0 + jax.random.uniform(k1, (9,), minval=-0.01, maxval=0.01)
        qpos = qpos.at[2].set(0.0)
        x_rot = (jax.random.uniform(k2) - 0.5) * 2 * jnp.pi
        y_rot = (jax.random.uniform(k3) - 0.5) * 2 * self.reset_y_range
        z_rot = (jax.random.uniform(k4) - 0.5) * 2 * self.reset_z_range
        quat = scipy_euler_to_mj_quat_scrambled(x_rot, y_rot, z_rot)
        qpos = qpos.at[3:7].set(jnp.stack(quat))
        phys = PhysState(qpos=tuple(qpos), qvel=(jnp.zeros(()),) * 8,
                         warmstart=(jnp.zeros(()),) * 8)
        state = EnvState(
            phys=phys, t=jnp.int32(0),
            last_pitch=jnp.float32(0.0), last_t=jnp.float32(0.0),
            has_last=jnp.asarray(False),
            target_wheel_speed=jnp.float32(0.0), target_yaw=jnp.float32(0.0),
            key=kstate, aux=self._init_aux(k5))
        state = self._post_reset(state)
        obs, state = self._obs(state)
        return state, obs

    def _init_aux(self, key):
        return {}

    def _post_reset(self, state):
        return state

    def state_from_qpos(self, qpos, qvel=None, key=None):
        """Build an EnvState from explicit (qpos, qvel) — the parity-harness
        entry point (reference resets mix seeded/unseeded RNG; SURVEY §2.7).

        Mirrors the post-`reset()` bookkeeping: the reference's `reset` calls
        `_get_obs`, which seeds the fd-pitch_dot state with (pitch0, t=0)."""
        qpos = jnp.asarray(qpos)
        qvel = jnp.zeros(8, qpos.dtype) if qvel is None else jnp.asarray(qvel)
        phys = PhysState(qpos=tuple(qpos), qvel=tuple(qvel),
                         warmstart=(jnp.zeros((), qpos.dtype),) * 8)
        p0 = pitch_of(tuple(qpos))
        return EnvState(
            phys=phys, t=jnp.int32(0),
            last_pitch=p0, last_t=jnp.float32(0.0),
            has_last=jnp.asarray(True),
            target_wheel_speed=jnp.float32(0.0), target_yaw=jnp.float32(0.0),
            key=key if key is not None else jax.random.PRNGKey(0),
            aux=self._init_aux(jax.random.PRNGKey(1)))

    def _update_targets(self, state):
        return state

    def step(self, state: EnvState, action):
        state = self._update_targets(state)
        key, k_r, k_t, k_o = jax.random.split(state.key, 4)
        state = state._replace(key=key)
        qpos, qvel = state.phys.qpos, state.phys.qvel
        # 1) reward from pre-step state (env01_v1.py:16)
        reward = self._reward(state, k_r)
        # 2) ctrl = wheel qvel + action*4 (env01_v1.py:18-23)
        ctrl = (qvel[6] + action[0] * WHEEL_SPEED_DELTA_MAX,
                qvel[7] + action[1] * WHEEL_SPEED_DELTA_MAX)
        # 3) 250 implicitfast substeps (mj_step nstep=250)
        phys = self._control_step(state.phys, ctrl,
                                  state.aux.get("friction"))
        state = state._replace(phys=phys, t=state.t + 1)
        state = self._events(state)
        # 4) terminate |pitch|>50deg on a (possibly noisy) pitch sample
        pitch_term = self._pitch(state, jnp.stack(state.phys.qpos), k_t)
        terminated = jnp.abs(pitch_term) > TERMINATE_PITCH
        # 5) obs from post-step state
        obs, state = self._obs(state, k_o)
        truncated = state.t >= self.max_episode_steps
        return state, obs, reward, terminated, truncated

    def _events(self, state):
        return state

    def _reward(self, state, key):
        pitch = self._pitch(state, jnp.stack(state.phys.qpos), key)
        return base_reward(state, pitch)

    def _obs(self, state, key=None):
        if key is None:
            key = jax.random.fold_in(state.key, 17)
        k1, k2 = jax.random.split(key)
        qpos = jnp.stack(state.phys.qpos)
        # reference _get_obs calls get_pitch() twice (directly and inside
        # get_pitch_dot_alt) -> two independent noise draws in v2
        pitch_obs = self._pitch(state, qpos, k1)
        pitch_fd = self._pitch(state, qpos, k2)
        pd, lp, lt, hl = base.fd_pitch_dot(state, pitch_fd)
        qvel = state.phys.qvel
        vel_l, vel_r = base.wheel_velocities(qvel)
        obs = jnp.stack([
            pitch_obs / base.PITCH_MAX,
            pd / base.PITCH_DOT_MAX,
            vel_l / base.WHEEL_SPEED_MAX * 4.0,
            vel_r / base.WHEEL_SPEED_MAX * 4.0,
            (state.target_wheel_speed - base.wheel_speed(qvel))
            / base.WHEEL_SPEED_MAX * 4.0,
            (state.target_yaw - base.wheel_yaw(qvel)) / base.YAW_MAX * 3.0,
        ]).astype(jnp.float32)
        state = state._replace(last_pitch=lp, last_t=lt, has_last=hl)
        return obs, state


class Env01V2(Env01V1):
    """Balance with +-0.025 rad uniform pitch noise and wider reset z-rot
    (reference env01_v2.py)."""

    id = "Env01-v2"
    reset_y_range = 0.1    # env01_v2.py:61  (y_rot +-0.1)
    reset_z_range = 1.0    # env01_v2.py:62  (z_rot +-1.0)

    def _pitch(self, state, qpos, key):
        p = pitch_of(qpos)
        return p + (jax.random.uniform(key) - 0.5) * 0.05


class Env01V3(Env01V1):
    """Balance then follow a time-scheduled target speed, with a per-episode
    pitch sensor bias (reference env01_v3.py)."""

    id = "Env01-v3"

    def _init_aux(self, key):
        k1, k2 = jax.random.split(key)
        dts = jax.random.uniform(k1, minval=-10.0, maxval=10.0)
        dts = jnp.where(dts > 0, dts + 10.0, dts - 10.0)
        pitch_offset = jax.random.uniform(k2, minval=-0.0349066,
                                          maxval=0.0349066)
        return {"delay_target_speed": dts, "pitch_offset": pitch_offset}

    def _pitch(self, state, qpos, key):
        return pitch_of(qpos) + state.aux["pitch_offset"]

    def _update_targets(self, state):
        # schedule checked on pre-step data.time (env01_v3.py:28-36)
        t = base.time_of(state)
        dts = state.aux["delay_target_speed"]
        tw = state.target_wheel_speed
        tw = jnp.where(t > 1.0, dts, tw)
        tw = jnp.where(t > 3.0, -1.0 * dts, tw)
        tw = jnp.where(t > 4.5, 2.0 * dts, tw)
        tw = jnp.where(t > 5.5, 3.0 * dts, tw)
        return state._replace(target_wheel_speed=tw)

    def _reward(self, state, key):
        # custom move reward (env01_v3.py:56-96)
        pitch = self._pitch(state, jnp.stack(state.phys.qpos), key)
        qvel = state.phys.qvel
        ws = base.wheel_speed(qvel)
        tws = state.target_wheel_speed
        dv = tws - ws
        reward = 0.6 - jnp.abs(pitch) * 0.05
        MAX_DV = 40.0
        dv_s = jnp.abs(jnp.clip(dv, -MAX_DV, MAX_DV) / MAX_DV)
        reward -= 0.15 * dv_s
        lean = jnp.where(
            (tws > 0) & (tws > ws), -pitch * 10.0 * dv_s,
            jnp.where((tws < 0) & (tws < ws), pitch * 10.0 * dv_s,
                      jnp.where((tws > 0) & (tws < ws), pitch * 10.0 * dv_s,
                                jnp.where((tws < 0) & (tws > ws),
                                          -pitch * 10.0 * dv_s, 0.0))))
        reward += lean
        reward -= 0.007 * jnp.abs(state.target_yaw - base.wheel_yaw(qvel))
        return reward
