"""Scalar-unrolled linear algebra for TPU-native rigid-body physics.

Design: every per-env quantity is represented as python tuples of *scalars*
(jnp 0-d arrays once traced).  The per-env physics step is written against this
module and then `jax.vmap`-ed over the env batch, which turns every scalar into
a `(B,)` array.  This gives perfectly tiled `(B,)`-wide VPU ops on TPU — no
padded `(B, 3)` / `(B, 8, 8)` tensors anywhere in the hot loop — and lets XLA
fuse the whole substep into a handful of kernels.

Conventions (MuJoCo-compatible):
  * quaternions are (w, x, y, z)
  * 3x3 matrices are row tuples ((r00,r01,r02),(r10,...),...)
  * spatial (6D) vectors are (angular(3), linear(3)) tuples, MuJoCo c-frame
"""

import jax.numpy as jnp


# ---------------------------------------------------------------- vec3

def v3(x=0.0, y=0.0, z=0.0):
    return (x, y, z)


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(a, s):
    return tuple(x * s for x in a)


def vdot(a, b):
    return sum(x * y for x, y in zip(a, b))


def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vnorm(a):
    return jnp.sqrt(vdot(a, a))


def vnormalize(a, eps=0.0):
    n = vnorm(a)
    inv = 1.0 / jnp.maximum(n, jnp.asarray(eps) if eps else n * 0 + 1e-300)
    return vscale(a, inv), n


# ---------------------------------------------------------------- quat

def qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )


def qnormalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    inv = 1.0 / n
    return tuple(c * inv for c in q)


def qmat(q):
    """Rotation matrix of unit quaternion (w,x,y,z), rows tuple."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def qrot(q, v):
    """Rotate v by quaternion q (equivalent to qmat(q) @ v)."""
    return mvmul(qmat(q), v)


def qrot_inv(q, v):
    return mtvmul(qmat(q), v)


def axis_angle_quat(axis, angle):
    half = angle * 0.5
    s = jnp.sin(half)
    return (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)


def quat_integrate(q, omega_local, h):
    """MuJoCo mj_integratePos for quaternion dofs: q <- q * exp(h*w/2), normalized.

    omega_local is the body-local angular velocity (MuJoCo free/ball joint
    convention, verified against mujoco 3.10).
    """
    wx, wy, wz = omega_local
    angle = h * jnp.sqrt(wx * wx + wy * wy + wz * wz)
    # guard: normalized axis with safe divide; when angle==0 -> identity quat
    norm = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    # dtype-safe guard: 1e-300 underflows to 0 in float32, giving 0/0=NaN for
    # a body at exact rest; dividing by 1 instead is exact (w==0 -> axis 0)
    # and leaves every norm>0 case bit-identical.
    safe = jnp.where(norm > 0, norm, jnp.ones_like(norm))
    ax, ay, az = wx / safe, wy / safe, wz / safe
    half = angle * 0.5
    s = jnp.where(norm > 0, jnp.sin(half), 0.0)
    dq = (jnp.cos(half), ax * s, ay * s, az * s)
    return qnormalize(qmul(q, dq))


# ---------------------------------------------------------------- mat3

def mvmul(m, v):
    return (vdot(m[0], v), vdot(m[1], v), vdot(m[2], v))


def mtvmul(m, v):
    """m^T @ v."""
    return (
        m[0][0] * v[0] + m[1][0] * v[1] + m[2][0] * v[2],
        m[0][1] * v[0] + m[1][1] * v[1] + m[2][1] * v[2],
        m[0][2] * v[0] + m[1][2] * v[1] + m[2][2] * v[2],
    )


def mmul(a, b):
    return tuple(
        tuple(sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3))
        for i in range(3)
    )


def mcol(m, j):
    return (m[0][j], m[1][j], m[2][j])


# ------------------------------------------------------- spatial algebra
# Spatial motion vector s = (ang, lin); spatial force f = (rot, tra).
# MuJoCo stores both as 6-vectors [angular(3); linear(3)] in the c-frame.

def motion_cross(v, s):
    """mju_crossMotion: m = v x s for motion vectors."""
    va, vl = v[:3], v[3:]
    sa, sl = s[:3], s[3:]
    ra = vcross(va, sa)
    rl = vadd(vcross(vl, sa), vcross(va, sl))
    return ra + rl


def force_cross(v, f):
    """mju_crossForce: r = v x* f for force vectors."""
    va, vl = v[:3], v[3:]
    fa, fl = f[:3], f[3:]
    ra = vadd(vcross(va, fa), vcross(vl, fl))
    rl = vcross(va, fl)
    return ra + rl


def inert_mul(ci, s):
    """mju_mulInertVec: spatial momentum/force = cinert * motion vector.

    ci: 10-tuple (Ixx,Iyy,Izz,Ixy,Ixz,Iyz, hx,hy,hz, m) in MuJoCo cinert order,
    where h = m * (ipos - frame origin).
    """
    ixx, iyy, izz, ixy, ixz, iyz, hx, hy, hz, m = ci
    sa, sl = s[:3], s[3:]
    h = (hx, hy, hz)
    fa = (
        ixx * sa[0] + ixy * sa[1] + ixz * sa[2],
        ixy * sa[0] + iyy * sa[1] + iyz * sa[2],
        ixz * sa[0] + iyz * sa[1] + izz * sa[2],
    )
    fa = vadd(fa, vcross(h, sl))
    fl = vsub(vscale(sl, m), vcross(h, sa))
    return fa + fl


# ---------------------------------------------------- dense NxN (unrolled)

def chol_factor(M, n):
    """Unrolled Cholesky of tuple-of-tuples SPD matrix; returns lower L as list."""
    L = [[0.0] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def chol_solve(L, b, n):
    """Solve (L L^T) x = b, unrolled."""
    y = [0.0] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [0.0] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)
