"""Functional environment core: the RobotBaseEnv behavioral contract in JAX.

Reproduces the observation / reward / kinematic-getter semantics of the
reference `RobotBaseEnv` (reference src/balance_robot/envs/RobotBaseEnv.py)
as pure functions over an `EnvState` pytree:

  * obs(6) = [pitch/0.25, fd-pitch_dot/1.0, vel_l/170*4, vel_r/170*4,
              (target_speed - wheel_speed)/170*4, (target_yaw - wheel_yaw)/45*3]
    (RobotBaseEnv.py:221-246; the finite-difference pitch_dot carries
    last_pitch/last_time state across steps, and reset RE-ANCHORS it to
    the new episode's initial pitch at t=0 — reset_model calls _get_obs,
    whose get_pitch_dot_alt updates unconditionally, :142-157)
  * pitch = extrinsic-xyz euler x-angle of the chassis quaternion
    (scipy Rotation convention, RobotBaseEnv.py:127-135)
  * base balance reward (RobotBaseEnv.py:190-219) including the sign quirk
    where `average_wheel_speed = (-vel_l + vel_r)/2` (the negation of
    `get_wheel_speed`) — reproduced as-built.

Time is carried as an int32 control-step counter (dt = 5 ms exactly); the
reference accumulates float64 MuJoCo time but only ever uses differences at
control-step granularity, where both agree to ~1e-12.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..physics.step import PhysState
from ..physics.slin import qmat

PITCH_MAX = 0.25
PITCH_DOT_MAX = 1.0
WHEEL_SPEED_MAX = 170.0
WHEEL_SPEED_DELTA_MAX = 4.0
YAW_MAX = 45.0
CONTROL_DT = 0.005
TERMINATE_PITCH = 50.0 * jnp.pi / 180.0


class EnvState(NamedTuple):
    phys: PhysState
    t: jnp.ndarray              # int32 control-step count since episode start
    last_pitch: jnp.ndarray     # fd-pitch_dot state (re-anchored by the
                                # _obs inside reset, like the reference's
                                # reset_model -> _get_obs)
    last_t: jnp.ndarray         # float time of last _get_obs call
    has_last: jnp.ndarray       # bool
    target_wheel_speed: jnp.ndarray
    target_yaw: jnp.ndarray
    key: jnp.ndarray            # per-env PRNG key
    # env-specific scalar slots (friction for env02, pitch offset for env01-v3,
    # delayed target speed, env03 block bookkeeping...)
    aux: dict


def time_of(state: EnvState):
    return state.t.astype(jnp.float32) * CONTROL_DT


# ------------------------------------------------------------ kinematics

def pitch_of(qpos):
    """Euler-x (extrinsic xyz) of the chassis quaternion, scipy-compatible.

    Reference RobotBaseEnv.get_pitch (:127-135), incl. the quat[0]==0 -> 0
    guard.
    """
    q = (qpos[3], qpos[4], qpos[5], qpos[6])
    n = jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2)
    n = jnp.maximum(n, 1e-30)
    q = tuple(c / n for c in q)
    R = qmat(q)
    pitch = jnp.arctan2(R[2][1], R[2][2])
    return jnp.where(qpos[3] == 0.0, 0.0, pitch)


def yaw_of(qpos):
    """Euler-z (extrinsic xyz), reference get_yaw (:177-184)."""
    q = (qpos[3], qpos[4], qpos[5], qpos[6])
    n = jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2)
    n = jnp.maximum(n, 1e-30)
    q = tuple(c / n for c in q)
    R = qmat(q)
    yaw = jnp.arctan2(R[1][0], R[0][0])
    return jnp.where(qpos[3] == 0.0, 0.0, yaw)


def wheel_velocities(qvel):
    return qvel[6], qvel[7]


def wheel_yaw(qvel):
    vel_l, vel_r = wheel_velocities(qvel)
    return vel_l + vel_r          # vel_l - (-1*vel_r), RobotBaseEnv.py:167-170


def wheel_speed(qvel):
    vel_l, vel_r = wheel_velocities(qvel)
    return (vel_l - vel_r) / 2.0  # (vel_l + (-1*vel_r))/2, RobotBaseEnv.py:172-175


def yaw_dot(qvel):
    return qvel[5]                # free-joint angular z (body-local), :186-188


def pitch_dot_gyro(qvel):
    return qvel[3]                # get_pitch_dot, :137-140 (not on obs path)


# ------------------------------------------------------------ obs / reward

def fd_pitch_dot(state: EnvState, pitch):
    """get_pitch_dot_alt: finite difference vs the previous _get_obs call.

    Returns (pitch_dot, new last_pitch/last_t/has_last)."""
    t = time_of(state)
    dt = t - state.last_t
    ok = state.has_last & (dt > 0.0)
    pd = jnp.where(ok, (pitch - state.last_pitch) / jnp.where(ok, dt, 1.0), 0.0)
    return pd, pitch, t, jnp.asarray(True)


def base_reward(state: EnvState, pitch):
    """RobotBaseEnv._get_reward (:190-219) with its as-built sign quirk."""
    qvel = state.phys.qvel
    vel_l, vel_r = wheel_velocities(qvel)
    average_wheel_speed = (-vel_l + vel_r) / 2.0
    dv = 0.0 - average_wheel_speed
    reward = 1.0
    reward -= 0.025 * jnp.abs(0.0 - yaw_dot(qvel))
    reward -= jnp.abs(pitch)
    reward += pitch * dv * 0.5
    return reward


# ------------------------------------------------------------ reset helpers

def scipy_euler_to_mj_quat_scrambled(x_rot, y_rot, z_rot):
    """Reproduce the reference reset quirk exactly (env01_v1.py:46-53):

    scipy `Rotation.from_euler('xyz').as_quat()` returns [x, y, z, w], which
    the reference assigns RAW into MuJoCo's [w, x, y, z] qpos slots.  The
    observed orientation distribution therefore uses the scrambled quaternion
    (w=sx, x=sy, y=sz, z=sw); MuJoCo then normalizes it.  We replicate the raw
    assignment, not a "fixed" version.
    """
    def q_axis(half, axis):
        c, s = jnp.cos(half), jnp.sin(half)
        w = c
        xyz = [0.0, 0.0, 0.0]
        xyz[axis] = s
        return (w, xyz[0], xyz[1], xyz[2])

    from ..physics.slin import qmul
    qx = q_axis(x_rot * 0.5, 0)
    qy = q_axis(y_rot * 0.5, 1)
    qz = q_axis(z_rot * 0.5, 2)
    # extrinsic xyz: R = Rz Ry Rx -> q = qz * qy * qx  (scipy convention)
    q = qmul(qz, qmul(qy, qx))
    # scipy order [x,y,z,w]; write into mj slots [w,x,y,z] verbatim:
    sx, sy, sz, sw = q[1], q[2], q[3], q[0]
    return (sx, sy, sz, sw)
