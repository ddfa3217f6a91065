"""Privileged-observation wrapper: the TEACHER's view of an env.

`PrivilegedObsEnv` widens an env's observation to ``[obs, privileged(state)]``
so a standard symmetric PPO run trains a *privileged actor* — a policy that
sees the block's heading-frame kinematics (envs/env03.py::privileged) in
addition to the reference 6-obs proprioception.  The teacher is TRAINING
INFRASTRUCTURE ONLY: it can never deploy (the real robot has no block
sensor — reference src/balance_robot/envs/RobotBaseEnv.py:43-49 pins the
6-obs interface), but it serves two purposes:

  * it measures the observability floor: the gap between the teacher's
    survival rate and the best 6-obs student's is the part of Env03-v2 that
    genuinely cannot be solved through the deployment interface;
  * it is the label source for DAgger distillation into the 6-obs student
    (tools/distill_teacher.py) — the student learns the teacher's
    conditional-mean action given only the observable state, i.e. the
    observable-optimal projection of the teacher.

Everything except reset/step/obs_dim delegates to the wrapped env, so the
wrapper composes with VecEnv auto-reset (carry_across_reset and the pallas
physics path included) and with the ChunkedEvaluator.
"""

import jax.numpy as jnp


class PrivilegedObsEnv:
    def __init__(self, env):
        if not getattr(env, "priv_dim", 0):
            raise ValueError(
                f"{type(env).__name__} exposes no privileged features")
        self._env = env
        self.obs_dim = env.obs_dim + env.priv_dim

    def __getattr__(self, name):
        # only reached for attributes not set on the wrapper itself
        return getattr(self._env, name)

    def _aug(self, state, obs):
        return jnp.concatenate(
            [obs, self._env.privileged(state)], axis=-1)

    def reset(self, key):
        state, obs = self._env.reset(key)
        return state, self._aug(state, obs)

    def step(self, state, action):
        state2, obs, reward, terminated, truncated = self._env.step(
            state, action)
        return state2, self._aug(state2, obs), reward, terminated, truncated
