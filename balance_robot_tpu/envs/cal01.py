"""Cal01: motor-calibration env (reference cal01.py).

Constant ctrl = [20, 20] regardless of action; terminates when sim time
exceeds 1.0 s; reset places the robot at z = 0.15 with euler (0, 0, pi)
written through the reference's scrambled as_quat assignment (which lands on
a pi rotation about *y* — reproduced as-built).  The reference prints
`time, vel_l, vel_r` CSV every step (cal01.py:31) for fitting the motor model
against the real robot; here the same telemetry is returned in the obs-side
aux (`wheel_telemetry`) and printed by the CLI test loop.
"""

import jax
import jax.numpy as jnp

from ..physics.step import control_step
from . import base
from .env01 import Env01V1


class Cal01(Env01V1):
    id = "Cal01"
    max_episode_steps = 6000

    def reset(self, key):
        qpos = jnp.zeros(9)
        qpos = qpos.at[2].set(0.15)
        quat = base.scipy_euler_to_mj_quat_scrambled(
            jnp.float32(0.0), jnp.float32(0.0), jnp.pi)
        qpos = qpos.at[3:7].set(jnp.stack(quat))
        from ..physics.step import PhysState
        phys = PhysState(qpos=tuple(qpos), qvel=(jnp.zeros(()),) * 8,
                         warmstart=(jnp.zeros(()),) * 8)
        state = base.EnvState(
            phys=phys, t=jnp.int32(0),
            last_pitch=jnp.float32(0.0), last_t=jnp.float32(0.0),
            has_last=jnp.asarray(False),
            target_wheel_speed=jnp.float32(0.0), target_yaw=jnp.float32(0.0),
            key=key, aux={})
        obs, state = self._obs(state)
        return state, obs

    def step(self, state, action):
        key, k_r, k_o = jax.random.split(state.key, 3)
        state = state._replace(key=key)
        reward = self._reward(state, k_r)
        phys = control_step(state.phys, (jnp.float32(20.0),
                                         jnp.float32(20.0)), self.params)
        state = state._replace(phys=phys, t=state.t + 1)
        terminated = base.time_of(state) > 1.0
        obs, state = self._obs(state, k_o)
        truncated = state.t >= self.max_episode_steps
        return state, obs, reward, terminated, truncated

    def telemetry(self, state):
        """(time, vel_l, vel_r) — the CSV row the reference prints."""
        return (base.time_of(state), state.phys.qvel[6], state.phys.qvel[7])
