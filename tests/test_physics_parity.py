"""Oracle parity: the JAX physics step vs real MuJoCo (mujoco 3.10, CPU).

The reference envs drive `mujoco.mj_step` with nstep=250 (env01_v1.py:24);
these tests assert machine-precision (float64) agreement of our from-scratch
JAX pipeline with the MuJoCo C engine on the same states — smooth dynamics
fields, single substeps across contact regimes, and multi-control-step
rollouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from balance_robot_tpu.physics import robot_core as rc
from balance_robot_tpu.physics import step as st

XML = "/root/reference/src/balance_robot/envs/env01_v1.xml"


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def model():
    return mujoco.MjModel.from_xml_path(XML)


def random_state(rng, trial):
    qpos = np.zeros(9)
    qpos[:3] = [rng.normal() * 0.01, rng.normal() * 0.01,
                -0.0205 + rng.uniform(-0.002, 0.004)]
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if trial % 2 == 0:
        from scipy.spatial.transform import Rotation
        e = rng.normal(size=3) * 0.2
        qq = Rotation.from_euler("xyz", e).as_quat()
        q = np.array([qq[3], qq[0], qq[1], qq[2]])
    qpos[3:7] = q
    qpos[7:] = rng.normal(size=2)
    qvel = rng.normal(size=8) * np.array([.1, .1, .1, 1, 1, 1, 5, 5])
    ctrl = rng.normal(size=2) * 10
    return qpos, qvel, ctrl


def test_smooth_fields(model, x64):
    @jax.jit
    def smooth(qpos, qvel, ctrl):
        k = rc.fk(tuple(qpos))
        kv = rc.com_vel(k, tuple(qvel))
        M = rc.crb_mass_matrix(k)
        bias = rc.rne_bias(k, kv, tuple(qvel))
        act, _ = rc.actuation(tuple(ctrl), tuple(qvel), rc.ENV01_PARAMS)
        return k["com"], M, bias, act

    rng = np.random.default_rng(0)
    for trial in range(5):
        qpos, qvel, ctrl = random_state(rng, trial)
        d = mujoco.MjData(model)
        d.qpos[:], d.qvel[:], d.ctrl[:] = qpos, qvel, ctrl
        mujoco.mj_forward(model, d)
        com, M, bias, act = smooth(jnp.float64(qpos), jnp.float64(qvel),
                                   jnp.float64(ctrl))
        Mfull = np.zeros((8, 8))
        mujoco.mj_fullM(model, d, Mfull)
        assert np.abs(np.asarray(com) - d.subtree_com[1]).max() < 1e-12
        assert np.abs(np.asarray(M) - Mfull).max() < 1e-12
        assert np.abs(np.asarray(bias) - d.qfrc_bias).max() < 1e-12
        assert np.abs(np.asarray(act) - d.qfrc_actuator).max() < 1e-12


def test_substep_parity(model, x64):
    @jax.jit
    def jstep(qpos, qvel, ws, ctrl):
        s = st.PhysState(tuple(qpos), tuple(qvel), tuple(ws))
        s2 = st.substep(s, tuple(ctrl), rc.ENV01_PARAMS)
        return jnp.stack(s2.qpos), jnp.stack(s2.qvel)

    rng = np.random.default_rng(1)
    for trial in range(8):
        qpos, qvel, ctrl = random_state(rng, trial)
        d = mujoco.MjData(model)
        d.qpos[:], d.qvel[:], d.ctrl[:] = qpos, qvel, ctrl
        mujoco.mj_step(model, d)
        qp, qv = jstep(jnp.float64(qpos), jnp.float64(qvel),
                       jnp.zeros(8, jnp.float64), jnp.float64(ctrl))
        assert np.abs(np.asarray(qp) - d.qpos).max() < 1e-10, trial
        assert np.abs(np.asarray(qv) - d.qvel).max() < 1e-10, trial


def test_control_step_rollout(model, x64):
    """3 x 250 substeps under servo control from rest: the env hot path."""
    @jax.jit
    def jctrl(qpos, qvel, ws, ctrl):
        s = st.PhysState(tuple(qpos), tuple(qvel), tuple(ws))
        s2 = st.control_step(s, tuple(ctrl), rc.ENV01_PARAMS)
        return jnp.stack(s2.qpos), jnp.stack(s2.qvel), jnp.stack(s2.warmstart)

    qpos = np.array([0, 0, 0, 1, 0, 0, 0, 0, 0], float)
    qvel = np.zeros(8)
    ws = np.zeros(8)
    d = mujoco.MjData(model)
    d.qpos[:], d.qvel[:] = qpos, qvel
    for cs in range(3):
        ctrl = np.array([2.0 * np.sin(cs * 0.5), 2.0 * np.cos(cs * 0.5)])
        d.ctrl[:] = ctrl
        mujoco.mj_step(model, d, nstep=250)
        qpos, qvel, ws = jctrl(jnp.float64(qpos), jnp.float64(qvel),
                               jnp.float64(ws), jnp.float64(ctrl))
        qpos, qvel, ws = map(np.asarray, (qpos, qvel, ws))
        assert np.abs(qpos - d.qpos).max() < 1e-12
        assert np.abs(qvel - d.qvel).max() < 1e-12
