"""Env03 family: projectile-block perturbation envs.

Reference env03_v1.py / env03_v2.py / env03_v1_fail.py: a 4 cm free block is
fired at the robot; when it slows below 0.1 m/s it is parked at (10,10,0) and
respawned after `block_delay` seconds, aimed at the robot (v1: random
direction, speed 5; v2: always the front OR back face chosen once per env
instance, speed 7.5, delay 0.5 s).

The block's physics runs in the 14-dof coupled step (physics/block_step.py);
the event logic is where-masked at control-step boundaries, exactly the
reference's step-granularity semantics (the block state is only mutated
between mj_step calls).

Env03-v1-fail adds the motor cut-out once terminated (env03_v1_fail.py:37-42).
The decorative "FAIL" STL drop (:132-140) is render-side garnish that only
exists after termination; it is reproduced in the replay tooling, not in the
physics (documented deviation).
"""

import jax
import jax.numpy as jnp

from ..physics import robot_core as rc
from ..physics import block_step as bs
from ..physics.block_step import PhysState14, control_step14
from . import base
from .base import (EnvState, WHEEL_SPEED_DELTA_MAX, TERMINATE_PITCH, pitch_of,
                   yaw_of, scipy_euler_to_mj_quat_scrambled)
from .env01 import Env01V1


class Env03V1(Env01V1):
    id = "Env03-v1"
    max_episode_steps = 6000
    params = bs.ENV03_PARAMS
    block_delay = 0.0
    block_speed = 5.0
    # reset euler ranges: x +-pi, y/z +-0.2 (env03_v1.py:67-70)
    reset_y_range = 0.2
    reset_z_range = 0.2

    def _init_aux(self, key):
        return {"delay_started": jnp.asarray(False),
                "delay_t0": jnp.float32(0.0)}

    # ----------------------------------------- privileged critic features
    # Asymmetric actor-critic: the TRAINING-ONLY value net may see the
    # block's state (the actor keeps the deployment-pinned 6-obs interface,
    # matching the reference's real robot which has no block sensor).  A
    # 6-obs critic cannot anticipate an incoming block, so impact damage
    # arrives as unpredictable advantage noise ~8 control steps after
    # launch; these features let V(s) price the flight in, cutting GAE
    # variance exactly where the flagship's losses concentrate (median
    # death lags the fatal launch by ~76 steps, docs/TRAINING.md).
    priv_dim = 8

    def _attack_hint(self, state):
        """Upcoming-launch side when it is an env-instance property
        (Env03-v2): +1 front / -1 back; 0 when per-launch random (v1)."""
        return jnp.float32(0.0)

    def privileged(self, state):
        """(8,) block features in the robot's heading frame: rel position
        /0.3 (spawn-circle radius), rel velocity /block_speed, parked flag,
        attack-side hint.  Geometry is zeroed while the block is parked at
        (10,10) so the critic sees a clean 'no threat' state instead of a
        huge off-scale vector."""
        qpos = jnp.stack(state.phys.qpos)
        qvel = jnp.stack(state.phys.qvel)
        rel = qpos[9:12] - qpos[0:3]
        vel = qvel[8:11]
        yaw = yaw_of(tuple(qpos))
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        fwd = jnp.stack([c * rel[0] + s * rel[1],
                         -s * rel[0] + c * rel[1], rel[2]])
        fv = jnp.stack([c * vel[0] + s * vel[1],
                        -s * vel[0] + c * vel[1], vel[2]])
        # parked = awaiting respawn at (10,10).  aux["delay_started"] is the
        # EXACT event-machinery state (_events: set when the block parks,
        # cleared the step it respawns) — no distance threshold to
        # misclassify a far-but-live missed block or a robot that drifted
        # toward the park point.
        parked = state.aux["delay_started"]
        live = jnp.where(parked, 0.0, 1.0)
        feats = jnp.concatenate([
            fwd * live / 0.3,
            fv * live / self.block_speed,
            jnp.stack([jnp.where(parked, 1.0, 0.0),
                       self._attack_hint(state)]),
        ])
        return feats.astype(jnp.float32)

    def use_pallas_physics(self, interpret=False):
        """Fused 14-dof pallas control step (robot+block) under vmap;
        single-env calls keep the XLA path (physics/pallas_block.py)."""
        from ..physics import pallas_block
        self._pallas_cs14 = pallas_block.make_vmappable_control_step14(
            self.params, interpret=interpret)
        self._pallas_interpret = interpret
        return self

    def reset(self, key):
        k1, k2, k3, k4, k5, k6, kstate = jax.random.split(key, 7)
        qpos = jnp.zeros(16).at[3].set(1.0).at[12].set(1.0)
        qpos = qpos + jax.random.uniform(k1, (16,), minval=-0.01, maxval=0.01)
        qpos = qpos.at[2].set(0.0)
        x_rot = (jax.random.uniform(k2) - 0.5) * 2 * jnp.pi
        y_rot = (jax.random.uniform(k3) - 0.5) * 2 * self.reset_y_range
        z_rot = (jax.random.uniform(k4) - 0.5) * 2 * self.reset_z_range
        quat = scipy_euler_to_mj_quat_scrambled(x_rot, y_rot, z_rot)
        qpos = qpos.at[3:7].set(jnp.stack(quat))
        qvel = jnp.zeros(14)
        state = EnvState(
            phys=PhysState14(qpos=tuple(qpos), qvel=tuple(qvel),
                             warmstart=(jnp.zeros(()),) * 14),
            t=jnp.int32(0),
            last_pitch=jnp.float32(0.0), last_t=jnp.float32(0.0),
            has_last=jnp.asarray(False),
            target_wheel_speed=jnp.float32(0.0), target_yaw=jnp.float32(0.0),
            key=kstate, aux=self._init_aux(k5))
        # reset fires the first block immediately (env03_v1.py:80)
        state = self._spawn_block(state, k6)
        obs, state = self._obs(state)
        return state, obs

    # ------------------------------------------------ block event machinery
    def _attack_angle(self, state, key):
        return jax.random.uniform(key) * 2 * jnp.pi

    def _target_jitter(self):
        # (x jitter half-range, z low, z range) — env03_v1.py:96-100
        return 0.03, 0.1, 0.075

    def _spawn_block(self, state, key):
        """set_block_pos_vel (env03_v1.py:88-114) as pure state update."""
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        qpos = jnp.stack(state.phys.qpos)
        qvel = jnp.stack(state.phys.qvel)
        robot_pos = qpos[0:3]
        angle = self._attack_angle(state, k1)
        bx = 0.3 * jnp.sin(angle) + robot_pos[0]
        by = 0.3 * jnp.cos(angle) + robot_pos[1]
        block_pos = jnp.stack([bx, by, jnp.float32(0.15)])
        jx, zlo, zrange = self._target_jitter()
        target = jnp.stack([
            (jax.random.uniform(k2) - 0.5) * 2 * jx + robot_pos[0],
            robot_pos[1],
            jax.random.uniform(k3) * zrange + zlo])
        v = target - block_pos
        v = self.block_speed * v / jnp.linalg.norm(v)
        x_rot = jax.random.uniform(k4) * 2 * jnp.pi
        y_rot = jax.random.uniform(k5) * 2 * jnp.pi
        z_rot = jax.random.uniform(k6) * 2 * jnp.pi
        quat = jnp.stack(scipy_euler_to_mj_quat_scrambled(x_rot, y_rot,
                                                          z_rot))
        qpos = qpos.at[9:12].set(block_pos).at[12:16].set(quat)
        qvel = qvel.at[8:11].set(v)
        return state._replace(
            phys=state.phys._replace(qpos=tuple(qpos), qvel=tuple(qvel)))

    def _events(self, state):
        """Block slow-down -> park -> delayed respawn (env03_v1.py:39-49)."""
        key, k_spawn = jax.random.split(state.key)
        state = state._replace(key=key)
        qpos = jnp.stack(state.phys.qpos)
        qvel = jnp.stack(state.phys.qvel)
        t = base.time_of(state)
        speed = jnp.linalg.norm(qvel[8:11])
        started = state.aux["delay_started"]
        # 1) park the block when slow and no respawn pending
        park = (speed < 0.1) & ~started
        qpos = qpos.at[9:12].set(jnp.where(park, jnp.array([10.0, 10.0, 0.0]),
                                           qpos[9:12]))
        t0 = jnp.where(park, t, state.aux["delay_t0"])
        started = started | park
        state = state._replace(
            phys=state.phys._replace(qpos=tuple(qpos)),
            aux={**state.aux, "delay_started": started, "delay_t0": t0})
        # 2) respawn after the delay
        fire = started & ((t - t0) > self.block_delay)
        spawned = self._spawn_block(state, k_spawn)
        state = jax.tree.map(lambda a, b: jnp.where(fire, a, b),
                             spawned, state)
        state = state._replace(
            aux={**state.aux,
                 "delay_started": jnp.where(fire, False, started)})
        return state

    def step(self, state: EnvState, action):
        state = self._update_targets(state)
        key, k_r, k_t, k_o = jax.random.split(state.key, 4)
        state = state._replace(key=key)
        qvel = state.phys.qvel
        reward = self._reward(state, k_r)
        ctrl = self._ctrl(state, action)
        cs = getattr(self, "_pallas_cs14", None)
        if cs is not None:
            phys = cs(state.phys, ctrl)
        else:
            phys = control_step14(state.phys, ctrl, self.params,
                                  friction=state.aux.get("friction"))
        state = state._replace(phys=phys, t=state.t + 1)
        state = self._events(state)
        pitch_term = self._pitch(state, jnp.stack(state.phys.qpos), k_t)
        terminated = jnp.abs(pitch_term) > TERMINATE_PITCH
        state = self._post_terminate(state, terminated)
        obs, state = self._obs(state, k_o)
        truncated = state.t >= self.max_episode_steps
        return state, obs, reward, terminated, truncated

    def _ctrl(self, state, action):
        qvel = state.phys.qvel
        return (qvel[6] + action[0] * WHEEL_SPEED_DELTA_MAX,
                qvel[7] + action[1] * WHEEL_SPEED_DELTA_MAX)

    def _post_terminate(self, state, terminated):
        return state


class Env03V2(Env03V1):
    """Blocks always from the front OR back face (chosen once per env
    *instance*, reference env03_v2.py:22), speed 7.5, delay 0.5 s, tighter
    aim.  Registered with max_episode_steps=1200 (balance_robot/__init__.py:50).
    """

    id = "Env03-v2"
    max_episode_steps = 1200
    block_delay = 0.5
    block_speed = 7.5

    def _init_aux(self, key):
        aux = super()._init_aux(key)
        aux["attack_front"] = jax.random.uniform(key) > 0.5
        return aux

    def carry_across_reset(self, old_state, new_state):
        """attack_side_front is an env-instance property, not per-episode."""
        return new_state._replace(
            aux={**new_state.aux, "attack_front": old_state.aux["attack_front"]})

    def _attack_angle(self, state, key):
        qpos = jnp.stack(state.phys.qpos)
        angle = -yaw_of(tuple(qpos))
        return jnp.where(state.aux["attack_front"], angle, angle + jnp.pi)

    def _attack_hint(self, state):
        # the side is fixed per env instance (reference env03_v2.py:22) and
        # unobservable from the 6-obs interface — surfacing it to the
        # privileged critic separates "unlucky side" value variance from
        # policy-quality variance (front/back gap: 93.5% vs 78.8%)
        return jnp.where(state.aux["attack_front"], 1.0, -1.0)

    def _target_jitter(self):
        return 0.01, 0.13, 0.025   # env03_v2.py:41-45


class Env03V1Fail(Env03V1):
    """As v1, plus the motors are cut once the robot has fallen
    (env03_v1_fail.py:37-42).  The decorative FAIL-mesh drop is handled by the
    replay/visualization tooling only."""

    id = "Env03-v1-fail"

    def _init_aux(self, key):
        aux = super()._init_aux(key)
        aux["fallen"] = jnp.asarray(False)
        return aux

    def _ctrl(self, state, action):
        qvel = state.phys.qvel
        fallen = state.aux["fallen"]
        return (jnp.where(fallen, 0.0,
                          qvel[6] + action[0] * WHEEL_SPEED_DELTA_MAX),
                jnp.where(fallen, 0.0,
                          qvel[7] + action[1] * WHEEL_SPEED_DELTA_MAX))

    def _post_terminate(self, state, terminated):
        return state._replace(
            aux={**state.aux, "fallen": state.aux["fallen"] | terminated})
