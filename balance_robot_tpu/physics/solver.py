"""MuJoCo-parity soft-constraint solver (primal Newton, pyramidal cone).

MuJoCo's constraint model (verified numerically against mujoco 3.10, see
tests/test_physics_parity.py):

    qacc = argmin_a  1/2 (a - a_smooth)' M (a - a_smooth)
                     + 1/2 sum_i D_i * min(J_i a - aref_i, 0)^2

over the 4 pyramid rows per contact, J_row = (n +- mu_k t_k) . J_point built
at the contact midpoint `pos`, with

    aref_i = -(2/(dmax*tc)) * (J_i qvel) - (d(r)/(dmax^2 tc^2 zeta^2)) * pos_i
    R_i    = max(mjMINVAL, (1-d)/d * diagApprox_i)
    D_i    = 1/R_i
    diagApprox_i = 2*mu_k^2*(1+mu_k^2) * sum(body_invweight0)   (pyramid rows)
    d(r)   = solimp sigmoid of |pos|/width

The solver is MuJoCo's own Newton method in primal (qacc) space: exact nv x nv
Hessian Cholesky + piecewise-quadratic exact line search, warm-started from
the previous substep's qacc, run for a fixed (jit-friendly) iteration count.

Layout: the nv axis stays scalar-unrolled (tuples), the constraint-row axis is
a stacked (R,) jnp array — under vmap that becomes (B, R), which tiles well on
the TPU VPU, and the Newton/line-search loops are lax.fori_loop so the jitted
graph stays small.
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .slin import chol_factor, chol_solve
from .contacts import NORMAL, T1, T2

MJ_MINVAL = 1e-15
MJ_MINMU = 1e-5

class EfcRows(NamedTuple):
    Jc: tuple       # nv arrays of shape (R,): J columns
    aref: object    # (R,)
    D: object       # (R,)
    mask: object    # (R,) 0/1


def impedance(pos, solimp):
    """MuJoCo constraint impedance d(r) (verified incl. default solimp)."""
    d0, d1, width, mid, power = solimp
    x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
    a = 1.0 / (mid ** (power - 1.0))
    b = 1.0 / ((1.0 - mid) ** (power - 1.0))
    y = jnp.where(x < mid, a * x ** power, 1.0 - b * (1.0 - x) ** power)
    return jnp.clip(d0 + y * (d1 - d0), 0.0001, 0.9999)


def _jar(a, rows, nv):
    s = rows.Jc[0] * a[0]
    for j in range(1, nv):
        s = s + rows.Jc[j] * a[j]
    return s - rows.aref


def cost(a, a_smooth, M, rows, nv):
    jar = _jar(a, rows, nv)
    act = rows.mask * jnp.where(jar < 0, 1.0, 0.0)
    da = [a[j] - a_smooth[j] for j in range(nv)]
    c = 0.0
    for r in range(nv):
        c = c + 0.5 * da[r] * sum(M[r][j] * da[j] for j in range(nv))
    return c + 0.5 * jnp.sum(rows.D * act * jar * jar, axis=0)


def solve_newton(a_init, a_smooth, M, rows, nv, iters=8, ls_iters=8):
    """Fixed-iteration primal Newton matching MuJoCo's Newton solver."""

    def newton_body(_, a):
        jar = _jar(a, rows, nv)
        act = rows.mask * jnp.where(jar < 0, 1.0, 0.0)
        w = rows.D * act
        da = [a[j] - a_smooth[j] for j in range(nv)]
        g = []
        wj = w * jar
        for r in range(nv):
            g.append(sum(M[r][j] * da[j] for j in range(nv))
                     + jnp.sum(wj * rows.Jc[r], axis=0))
        H = [[None] * nv for _ in range(nv)]
        for r in range(nv):
            for c2 in range(r + 1):
                H[r][c2] = M[r][c2] + jnp.sum(w * rows.Jc[r] * rows.Jc[c2],
                                              axis=0)
                H[c2][r] = H[r][c2]
        L = chol_factor(tuple(tuple(rr) for rr in H), nv)
        step = chol_solve(L, tuple(-x for x in g), nv)
        # exact line search on the piecewise-quadratic phi(t)
        Jd = rows.Jc[0] * step[0]
        for j in range(1, nv):
            Jd = Jd + rows.Jc[j] * step[j]
        Md = [sum(M[r][j] * step[j] for j in range(nv)) for r in range(nv)]
        dMd = sum(step[r] * Md[r] for r in range(nv))
        dMda = sum(Md[r] * da[r] for r in range(nv))
        DJd = rows.D * Jd

        def ls_body(_, t):
            jt = jar + t * Jd
            actt = rows.mask * jnp.where(jt < 0, 1.0, 0.0)
            phi1 = dMda + t * dMd + jnp.sum(actt * DJd * jt, axis=0)
            phi2 = dMd + jnp.sum(actt * DJd * Jd, axis=0)
            return t - phi1 / jnp.maximum(phi2, MJ_MINVAL)

        t = lax.fori_loop(0, ls_iters, ls_body, jnp.zeros_like(dMd) + 1.0)
        t = jnp.maximum(t, 0.0)
        return tuple(a[j] + t * step[j] for j in range(nv))

    return lax.fori_loop(0, iters, newton_body, tuple(a_init))


def constraint_forces(a, rows, nv):
    """Per-row pyramid forces and qfrc_constraint for the converged qacc."""
    jar = _jar(a, rows, nv)
    f = rows.mask * rows.D * jnp.maximum(-jar, 0.0)
    qfrc = tuple(jnp.sum(f * rows.Jc[j], axis=0) for j in range(nv))
    return f, qfrc
