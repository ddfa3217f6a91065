"""TPU-native rigid-body dynamics for the two-wheel balance robot.

Re-implements, from scratch in JAX, the exact MuJoCo computation pipeline for
the reference robot model (/root/reference/src/balance_robot/envs/robot-02.xml
compiled into the env01/env02/env03 scenes — see SURVEY.md §2.9):

    kinematics -> com-based inertias (cinert/cdof) -> CRB mass matrix ->
    RNE bias -> passive/actuator forces -> plane-cylinder / plane-box
    contacts -> convex soft-constraint solve (Newton, pyramidal cone) ->
    implicitfast integration.

Every formula here was verified numerically against mujoco 3.10.0 (see
tests/test_physics_parity.py).  The state layout matches MuJoCo:

    qpos = (x, y, z, qw, qx, qy, qz, theta_l, theta_r)          # nq = 9
    qvel = (vx, vy, vz [world], wx, wy, wz [body-local], dl, dr) # nv = 8

All math is scalar-unrolled (see slin.py): under `vmap` every intermediate is
a `(B,)` array, which maps perfectly onto the TPU VPU with zero tile padding.
"""

from dataclasses import dataclass

import jax.numpy as jnp

from .slin import (
    vadd, vsub, vscale, vdot, vcross,
    qnormalize, qmat,
    mvmul, mcol, motion_cross, force_cross, inert_mul,
)
from . import constants as C

NV = 8
FLOOR_Z = -0.02            # plane surface height (env01_v1.xml floor geom)
WHEEL_R = 0.034
WHEEL_H = 0.013            # half-length
CHASSIS_HALF = (0.05, 0.0185, 0.0855)
CHASSIS_OFF = (0.0, 0.0, 0.0995)   # chassis geom offset in body frame
MJ_MINMU = 1e-5
MJ_MINVAL = 1e-15


@dataclass(frozen=True)
class ContactParams:
    """Per contact-type solver parameters (MuJoCo pair/geom-derived)."""
    solref: tuple          # (timeconst, dampratio)
    solimp: tuple          # (d0, d1, width, midpoint, power)
    friction: tuple        # (mu1, mu2)
    margin: float
    invweight: float       # sum of body_invweight0 translational


@dataclass(frozen=True)
class RobotSceneParams:
    """Static (hashable) scene description for the robot-only scenes."""
    timestep: float = 2e-5
    gravity: tuple = (0.0, 0.0, -9.81)
    # compiled masses / inertias (inertiafromgeom=true -> geom-derived!)
    m_chassis: float = 0.6327
    m_wheel: float = 0.09442370879629483
    i_chassis: tuple = (0.0016139122500000002, 0.0020689817250000003,
                        0.0005994305250000002)
    i_wheel: tuple = (3.260765410432049e-05, 3.260765410432049e-05,
                      5.457690368425842e-05)
    chassis_ipos: tuple = (0.0, 0.0, 0.0995)
    wheel_pos_l: tuple = (-0.074, 0.0, 0.034)
    wheel_pos_r: tuple = (0.074, 0.0, 0.034)
    # wheel inertia frame: local cylinder axis is x (iquat (.707,0,.707,0))
    joint_damping: float = 0.01
    # actuator (velocity servo)
    act_gain: float = 4.0
    act_bias: float = -4.0
    ctrl_range: float = 78.54
    force_range: float = 0.65
    # contact params
    wheel_contact: ContactParams = ContactParams(
        solref=(0.02, 0.5), solimp=(0.5, 0.5, 0.002, 0.5, 2.0),
        friction=(0.9, 0.9), margin=0.0,
        invweight=3.3757186541109845)
    chassis_contact: ContactParams = ContactParams(
        solref=(0.02, 1.0), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
        friction=(1.0, 1.0), margin=0.0,
        invweight=1.2709072512005732)
    # env02: friction taken from env state instead of the static pair value
    dynamic_friction: bool = False
    # envMove05: static wall boxes ((center, half-extents), ...) the robot
    # collides with (axis-aligned, world body)
    walls: tuple = ()
    wall_contact: ContactParams = ContactParams(
        solref=(0.02, 1.0), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
        friction=(1.0, 1.0), margin=0.0,
        invweight=0.0)  # per-contact invweight added from the robot body
    # solver iteration counts (fixed for jit; validated vs oracle tolerance)
    newton_iters: int = 8
    ls_iters: int = 10


ENV01_PARAMS = RobotSceneParams()
# env02_v1.xml has no explicit <contact> pairs: wheels use default geom-derived
# params (friction combined via element-wise max, solref/solimp solmix-averaged
# = defaults) and the slide friction is randomized per episode (env02_v1.py:57-65)
ENV02_PARAMS = RobotSceneParams(
    wheel_contact=ContactParams(
        solref=(0.02, 1.0), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
        friction=(1.0, 1.0), margin=0.0,
        invweight=3.3757186541109845),
    dynamic_friction=True,
)


# ===================================================================
# Smooth dynamics
# ===================================================================

def fk(qpos):
    """Forward kinematics + com quantities (mj_kinematics + mj_comPos).

    Returns a dict with world poses, subtree com, cinert (3 bodies x 10),
    cdof (8 x 6 spatial motion vectors at the com frame).
    """
    pos = (qpos[0], qpos[1], qpos[2])
    quat = qnormalize((qpos[3], qpos[4], qpos[5], qpos[6]))
    R = qmat(quat)

    # body origins
    xpos_ch = pos
    xpos_l = vadd(pos, mvmul(R, (-0.074, 0.0, 0.034)))
    xpos_r = vadd(pos, mvmul(R, (0.074, 0.0, 0.034)))

    # inertial frame positions (wheel ipos = 0, chassis ipos = (0,0,0.0995))
    xipos_ch = vadd(pos, mvmul(R, (0.0, 0.0, 0.0995)))
    xipos_l = xpos_l
    xipos_r = xpos_r

    p = ENV01_PARAMS
    m_ch, m_w = p.m_chassis, p.m_wheel
    m_tot = m_ch + 2 * m_w
    com = vscale(
        vadd(vscale(xipos_ch, m_ch), vadd(vscale(xipos_l, m_w), vscale(xipos_r, m_w))),
        1.0 / m_tot)

    # --- cinert: inertia about com frame (world axes), MuJoCo 10-vector
    # chassis inertia frame = body frame (iquat identity)
    cin_ch = _cinert(R, p.i_chassis, m_ch, vsub(xipos_ch, com))
    # wheel inertia frame: iquat (0.707,0,0.707,0) maps local z->x: the
    # cylinder symmetry axis is body-x.  Wheel body rotation about its hinge
    # (axis +-x) spins around the symmetry axis, so the world inertia of the
    # wheel only depends on the chassis orientation:
    # I_world = R * diag(Izz, Ixx, Ixx) * R^T  (cylinder axis inertia on x)
    iw = (p.i_wheel[2], p.i_wheel[0], p.i_wheel[1])
    cin_l = _cinert(R, iw, m_w, vsub(xipos_l, com))
    cin_r = _cinert(R, iw, m_w, vsub(xipos_r, com))

    # --- cdof (spatial motion at com frame origin, world axes)
    # free joint: 3 translations along world axes, then 3 rotations about the
    # *body-local* axes anchored at the body origin (verified vs mujoco 3.10)
    cdof = []
    for i in range(3):
        e = tuple(1.0 if j == i else 0.0 for j in range(3))
        cdof.append((0.0, 0.0, 0.0) + e)
    off_ch = vsub(com, xpos_ch)
    for i in range(3):
        a = mcol(R, i)
        cdof.append(a + vcross(a, off_ch))
    # hinge dofs: axis in world, anchored at wheel origin
    a_l = mvmul(R, (-1.0, 0.0, 0.0))
    cdof.append(a_l + vcross(a_l, vsub(com, xpos_l)))
    a_r = mvmul(R, (1.0, 0.0, 0.0))
    cdof.append(a_r + vcross(a_r, vsub(com, xpos_r)))

    return dict(pos=pos, quat=quat, R=R,
                xpos_l=xpos_l, xpos_r=xpos_r, xipos_ch=xipos_ch,
                com=com, cinert=(cin_ch, cin_l, cin_r), cdof=tuple(cdof))


def _cinert(R, idiag, m, d):
    """MuJoCo cinert 10-vector: inertia in com frame with offset d."""
    # I_world = R diag R^T
    r0, r1, r2 = mcol(R, 0), mcol(R, 1), mcol(R, 2)
    I = [[0.0] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            I[a][b] = (idiag[0] * r0[a] * r0[b] + idiag[1] * r1[a] * r1[b]
                       + idiag[2] * r2[a] * r2[b])
    dd = vdot(d, d)
    # parallel axis: I += m (d.d E - d d^T)
    for a in range(3):
        I[a][a] = I[a][a] + m * dd
        for b in range(3):
            I[a][b] = I[a][b] - m * d[a] * d[b]
    h = vscale(d, m)
    return (I[0][0], I[1][1], I[2][2], I[0][1], I[0][2], I[1][2],
            h[0], h[1], h[2], m)


def com_vel(k, qvel):
    """mj_comVel: body spatial velocities cvel + cdof_dot."""
    cdof = k["cdof"]
    # chassis: free joint. translation part first
    cvel_t = [0.0] * 6
    for i in range(3):
        for a in range(6):
            cvel_t[a] = cvel_t[a] + cdof[i][a] * qvel[i]
    # rotation dofs: cdof_dot = (cvel so far) x cdof  (MuJoCo does this with
    # the translation-only partial velocity for free joints)
    cdof_dot = [(0.0,) * 6] * NV
    cvel = list(cvel_t)
    for i in range(3, 6):
        cdof_dot[i] = motion_cross(tuple(cvel_t), cdof[i])
        for a in range(6):
            cvel[a] = cvel[a] + cdof[i][a] * qvel[i]
    cvel_ch = tuple(cvel)
    # wheels: single hinge each; cdof_dot uses parent (chassis) cvel
    cdof_dot[6] = motion_cross(cvel_ch, cdof[6])
    cvel_l = tuple(cvel_ch[a] + cdof[6][a] * qvel[6] for a in range(6))
    cdof_dot[7] = motion_cross(cvel_ch, cdof[7])
    cvel_r = tuple(cvel_ch[a] + cdof[7][a] * qvel[7] for a in range(6))
    return dict(cvel=(cvel_ch, cvel_l, cvel_r), cdof_dot=tuple(cdof_dot))


def crb_mass_matrix(k):
    """mj_crb: composite rigid body -> dense symmetric M (8x8 tuple rows)."""
    cin_ch, cin_l, cin_r = k["cinert"]
    # composite inertia of chassis subtree = sum of all three
    crb_ch = tuple(a + b + c for a, b, c in zip(cin_ch, cin_l, cin_r))
    cdof = k["cdof"]
    M = [[0.0] * NV for _ in range(NV)]
    # chassis dofs (0..5) with composite inertia
    f = [inert_mul(crb_ch, cdof[j]) for j in range(6)]
    for j in range(6):
        for i in range(j + 1):
            M[i][j] = vdot6(cdof[i], f[j])
            M[j][i] = M[i][j]
    # wheel dofs
    f_l = inert_mul(cin_l, cdof[6])
    f_r = inert_mul(cin_r, cdof[7])
    for i in range(6):
        M[i][6] = vdot6(cdof[i], f_l)
        M[6][i] = M[i][6]
        M[i][7] = vdot6(cdof[i], f_r)
        M[7][i] = M[i][7]
    M[6][6] = vdot6(cdof[6], f_l)
    M[7][7] = vdot6(cdof[7], f_r)
    # M[6][7] = 0 (different subtrees below chassis)
    return tuple(tuple(r) for r in M)


def vdot6(a, b):
    return sum(x * y for x, y in zip(a, b))


def rne_bias(k, kv, qvel, gravity=(0.0, 0.0, -9.81)):
    """mj_rne(flg_acc=0): qfrc_bias = C(q,v)v + g."""
    cdof = k["cdof"]
    cdof_dot = kv["cdof_dot"]
    cvel_ch, cvel_l, cvel_r = kv["cvel"]
    cin_ch, cin_l, cin_r = k["cinert"]
    # forward: cacc (world base acc = -gravity in linear part)
    cacc0 = (0.0, 0.0, 0.0) + tuple(-g for g in gravity)
    cacc_ch = list(cacc0)
    for j in range(6):
        for a in range(6):
            cacc_ch[a] = cacc_ch[a] + cdof_dot[j][a] * qvel[j]
    cacc_ch = tuple(cacc_ch)
    cacc_l = tuple(cacc_ch[a] + cdof_dot[6][a] * qvel[6] for a in range(6))
    cacc_r = tuple(cacc_ch[a] + cdof_dot[7][a] * qvel[7] for a in range(6))
    # cfrc_body = cinert*cacc + cvel x* (cinert*cvel)
    def body_frc(cin, cacc, cvel):
        f = inert_mul(cin, cacc)
        p = inert_mul(cin, cvel)
        fc = force_cross(cvel, p)
        return tuple(f[a] + fc[a] for a in range(6))
    f_ch = body_frc(cin_ch, cacc_ch, cvel_ch)
    f_l = body_frc(cin_l, cacc_l, cvel_l)
    f_r = body_frc(cin_r, cacc_r, cvel_r)
    # backward accumulate: chassis gets wheels
    f_ch_tot = tuple(f_ch[a] + f_l[a] + f_r[a] for a in range(6))
    bias = [0.0] * NV
    for j in range(6):
        bias[j] = vdot6(cdof[j], f_ch_tot)
    bias[6] = vdot6(cdof[6], f_l)
    bias[7] = vdot6(cdof[7], f_r)
    return tuple(bias)


def actuation(ctrl, qvel, p: RobotSceneParams):
    """Velocity servo: force = clip(gain*clip(ctrl) + bias*qvel, +-forcerange).

    Returns (qfrc_actuator(8), dforce_dv(2)) where dforce_dv is the velocity
    derivative used by implicitfast (zero where the force clamp is active —
    verified vs mujoco 3.10).
    """
    frc = []
    dfdv = []
    for i, dof in ((0, 6), (1, 7)):
        c = jnp.clip(ctrl[i], -p.ctrl_range, p.ctrl_range)
        raw = p.act_gain * c + p.act_bias * qvel[dof]
        clamped = jnp.clip(raw, -p.force_range, p.force_range)
        frc.append(clamped)
        dfdv.append(jnp.where(jnp.abs(raw) < p.force_range, p.act_bias, 0.0))
    qfrc = (0.0,) * 6 + tuple(frc)
    return qfrc, tuple(dfdv)
