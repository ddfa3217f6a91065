"""Hierarchical move stack: RobotMoveBaseEnv + EnvMove05-v1.

Reference RobotMoveBaseEnv.py: the trained (outer) policy commands
[target_speed, target_yaw]; the 200 Hz balancing is done *inside* env.step by
a frozen int8 policy (the robot's real two-level controller).  Here the inner
policy is a .brq artifact executed by the vmapped JAX int8 simulator
(ops/quant.py) — thousands of int8 policies run in lockstep on the TPU MXU.

Lidar: 8 rays at -50..50 deg (step 14.285) about z of the sensor frame
(RobotMoveBaseEnv.py:71-79), cast against the floor plane and the corridor
walls, with the reference's pitch correction and range rules (:212-277).
The reference's `front_indicator` body exists in no shipped XML (EnvMove05 is
WIP upstream); the sensor frame here is the chassis frame at height 0.110
(matching the correction formula's constants), and rays test the static scene
only (floor + walls).  The outer obs keeps the reference's as-built behavior
of zeroed lidar slots (:347-359) while the reward uses the real ray
distances (envMove05_v1.py:103-116).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import robot_core as rc
from ..physics.step import PhysState, control_step
from ..physics.slin import qmat
from . import base
from .base import (EnvState, WHEEL_SPEED_DELTA_MAX, TERMINATE_PITCH,
                   pitch_of, scipy_euler_to_mj_quat_scrambled)
from .env01 import Env01V1

# envMove05_v1.xml corridor walls ((center), (half-extents))
WALLS = (
    ((0.25, 0.0, -0.025), (0.01, 1.0, 0.2)),
    ((-0.25, 0.0, -0.025), (0.01, 1.0, 0.2)),
    ((0.0, 1.0, -0.025), (1.0, 0.01, 0.2)),
    ((0.0, -1.0, -0.025), (1.0, 0.01, 0.2)),
)

MOVE05_PARAMS = rc.RobotSceneParams(walls=WALLS)

RAY_ANGLES = np.arange(-50, 50.1, 14.285) * (np.pi / 180.0)   # 8 rays
LIDAR_RANGE = 0.3
LIDAR_HEIGHT = 0.110
WHEEL_RADIUS = 0.034
FLOOR_Z = -0.02


# Rz(a) @ (0,1,0) for each ray angle (reference precomputes these via
# scipy rotvec, RobotMoveBaseEnv.py:71-79).  Kept as a numpy constant:
# creating a device array at import time would initialize the XLA backend
# before jax.distributed.initialize on multi-host slices (see
# parallel/distributed.py); jnp converts it on trace.
RAY_DIRS_LOCAL = np.asarray([(-np.sin(a), np.cos(a), 0.0)
                             for a in RAY_ANGLES])


def raycast(origin, dirs):
    """Distances to the nearest static geom (floor plane + walls), per ray.

    origin (3,), dirs (8,3) world. Returns (8,) distances (inf when no hit).
    """
    INF = jnp.inf
    t_all = []
    # floor plane z = FLOOR_Z
    dz = dirs[:, 2]
    t_floor = (FLOOR_Z - origin[2]) / jnp.where(jnp.abs(dz) < 1e-12,
                                                1e-12, dz)
    t_all.append(jnp.where((jnp.abs(dz) > 1e-12) & (t_floor > 0),
                           t_floor, INF))
    for center, half in WALLS:
        c = jnp.asarray(center)
        h = jnp.asarray(half)
        lo = c - h
        hi = c + h
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
        t1 = (lo[None, :] - origin[None, :]) * inv
        t2 = (hi[None, :] - origin[None, :]) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=1)
        hit = (tmax >= tmin) & (tmax > 0)
        t = jnp.where(tmin > 0, tmin, tmax)   # inside-box -> exit distance
        t_all.append(jnp.where(hit, t, INF))
    return jnp.min(jnp.stack(t_all), axis=0)


def lidar_distances(qpos):
    """The reference's get_ray_hit_and_dist + pitch correction
    (RobotMoveBaseEnv.py:212-277) with the framework's sensor frame."""
    q = (qpos[3], qpos[4], qpos[5], qpos[6])
    n = jnp.sqrt(sum(c * c for c in q))
    q = tuple(c / jnp.maximum(n, 1e-30) for c in q)
    R = qmat(q)
    Rm = jnp.stack([jnp.stack(r) for r in R])
    origin = jnp.stack([qpos[0], qpos[1], qpos[2]]) + Rm @ jnp.array(
        [0.0, 0.0, LIDAR_HEIGHT])
    dirs = RAY_DIRS_LOCAL @ Rm.T
    dist = raycast(origin, dirs)
    # range limit: >0.3 (or no hit) -> 0.0 first (:215-217)
    dist = jnp.where(dist > LIDAR_RANGE, 0.0, dist)
    # floor-hit rejection + cos(pitch) correction (:219-229): sim pitch is
    # opposite to the real robot
    pitch = -pitch_of(qpos)
    sp = jnp.sin(pitch)
    tp = jnp.tan(pitch)
    floor_distance = (WHEEL_RADIUS / jnp.where(jnp.abs(sp) < 1e-9, 1e-9, sp)
                      + LIDAR_HEIGHT / jnp.where(jnp.abs(tp) < 1e-9, 1e-9, tp)
                      - 0.010)
    hit_floor = (dist >= floor_distance) & (floor_distance > 0)
    dist = jnp.where(hit_floor, 0.0, dist * jnp.cos(pitch))
    # zero (no hit) -> max observable; negative -> 0 (:265-275)
    dist = jnp.where(dist == 0.0, LIDAR_RANGE, dist)
    dist = jnp.where(dist < 0.0, 0.0, dist)
    return dist


class EnvMove05(Env01V1):
    """EnvMove05-v1 (reference envMove05_v1.py): outer policy sets target
    speed/yaw, reward = speed tracking + wall clearance on rays 2..5."""

    id = "EnvMove05-v1"
    obs_dim = 10
    act_dim = 2
    max_episode_steps = 700
    reward_threshold = 900.0
    params = MOVE05_PARAMS

    def __init__(self, inner_policy=None):
        """inner_policy: a QuantizedMLP (.brq); defaults to the packaged
        artifact produced by tools/make_inner_policy.py."""
        if inner_policy is None:
            import pathlib
            from ..export.pipeline import load_brq
            asset = (pathlib.Path(__file__).parent / "assets"
                     / "inner_policy.brq.npz")
            if not asset.exists():
                raise FileNotFoundError(
                    f"{asset} missing — train a balance policy and run "
                    "tools/make_inner_policy.py to generate the embedded "
                    "int8 inner policy")
            inner_policy = load_brq(asset)
        self.inner = inner_policy

    def reset(self, key):
        k1, k2, k3, k4, k5, kstate = jax.random.split(key, 6)
        qpos = jnp.zeros(9).at[3].set(1.0)
        qpos = qpos + jax.random.uniform(k1, (9,), minval=-0.01, maxval=0.01)
        qpos = qpos.at[2].set(0.0)
        x_rot = (jax.random.uniform(k2) - 0.5) * 2 * jnp.pi
        y_rot = (jax.random.uniform(k3) - 0.5) * 0.4
        z_rot = (jax.random.uniform(k4) - 0.5) * 0.4
        quat = scipy_euler_to_mj_quat_scrambled(x_rot, y_rot, z_rot)
        qpos = qpos.at[3:7].set(jnp.stack(quat))
        # target speed U(1,10)+30 (envMove05_v1.py:120-121)
        tws = jax.random.uniform(k5, minval=1.0, maxval=10.0) + 30.0
        state = EnvState(
            phys=PhysState(qpos=tuple(qpos), qvel=(jnp.zeros(()),) * 8,
                           warmstart=(jnp.zeros(()),) * 8),
            t=jnp.int32(0),
            last_pitch=jnp.float32(0.0), last_t=jnp.float32(0.0),
            has_last=jnp.asarray(False),
            target_wheel_speed=tws, target_yaw=jnp.float32(0.0),
            key=kstate, aux={})
        obs, state = self._obs(state)
        return state, obs

    def step(self, state: EnvState, action):
        key, k_t = jax.random.split(state.key, 2)
        state = state._replace(key=key)
        # 1) reward from pre-step state (envMove05_v1.py:24)
        reward = self._reward(state)
        # 2) hierarchical control: inner int8 balance policy sets the wheel
        #    servos from [a0*20, a1*45] targets (:26, RobotMoveBaseEnv:179-210)
        state, ctrl = self._step_wheel_speeds(
            state, action[0] * 20.0, action[1] * base.YAW_MAX)
        phys = self._control_step(state.phys, ctrl, None)
        state = state._replace(phys=phys, t=state.t + 1)
        terminated = jnp.abs(pitch_of(jnp.stack(state.phys.qpos))) \
            > TERMINATE_PITCH
        obs, state = self._obs(state)
        truncated = state.t >= self.max_episode_steps
        return state, obs, reward, terminated, truncated

    def _step_wheel_speeds(self, state, target_speed, target_yaw):
        from ..ops import quant
        state = state._replace(target_wheel_speed=target_speed,
                               target_yaw=target_yaw)
        qvel = state.phys.qvel
        qpos = jnp.stack(state.phys.qpos)
        pitch = pitch_of(qpos)
        pd, lp, lt, hl = base.fd_pitch_dot(state, pitch)
        state = state._replace(last_pitch=lp, last_t=lt, has_last=hl)
        vel_l, vel_r = base.wheel_velocities(qvel)
        inner_obs = jnp.stack([
            pitch / base.PITCH_MAX,
            pd / base.PITCH_DOT_MAX,
            vel_l / base.WHEEL_SPEED_MAX * 4.0,
            vel_r / base.WHEEL_SPEED_MAX * 4.0,
            (target_speed - base.wheel_speed(qvel))
            / base.WHEEL_SPEED_MAX * 4.0,
            (target_yaw - base.wheel_yaw(qvel)) / base.YAW_MAX * 3.0,
        ]).astype(jnp.float32)
        inner_action = quant.int8_policy_fn(self.inner)(inner_obs)
        ctrl = (qvel[6] + inner_action[0] * WHEEL_SPEED_DELTA_MAX,
                qvel[7] + inner_action[1] * WHEEL_SPEED_DELTA_MAX)
        return state, ctrl

    def _reward(self, state):
        # envMove05_v1.py:103-116
        qvel = state.phys.qvel
        ws = base.wheel_speed(qvel)
        tws = state.target_wheel_speed
        reward = 0.5 + 0.03 * (ws - tws) / tws
        dists = lidar_distances(jnp.stack(state.phys.qpos))
        for i in range(2, 6):
            reward += 0.15 * (dists[i] - 0.15) / 0.3
        return reward

    def _obs(self, state, key=None):
        # RobotMoveBaseEnv._get_obs (:347-359): lidar slots zeroed (WIP
        # behavior preserved as-built)
        qvel = state.phys.qvel
        obs = jnp.concatenate([
            jnp.stack([base.wheel_speed(qvel) / base.WHEEL_SPEED_MAX,
                       base.wheel_yaw(qvel) / base.YAW_MAX]),
            jnp.zeros(8),
        ]).astype(jnp.float32)
        return obs, state
