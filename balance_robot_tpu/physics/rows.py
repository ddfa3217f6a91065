"""Array-form constraint-row builder.

The smooth dynamics stay scalar-unrolled (optimal for the 250x substep loop),
but contact-row construction is a once-per-substep batch operation over up to
~40 candidate contacts — building it scalar-wise bloated the jitted graph to
~7k ops (slow XLA compiles).  Here each contact *type* is a `ContactSet` of
stacked arrays and the efc rows for a set are built with ~60 broadcasted ops:

    Jpt[c,j,:] = sign[c,j] * (cdof_lin[j] + cdof_ang[j] x (pos[c]-com_dof[j]))
    J3[c,d,j]  = frame[c,d,:] . Jpt[c,j,:]
    rows       = J3[:,0] +- mu * J3[:,1|2]        (pyramidal cone)

with the same verified MuJoCo formulas for aref / impedance / R as solver.py.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from . import solver as sv


class ContactSet(NamedTuple):
    """One homogeneous group of candidate contacts (same params/chain)."""
    pos: jnp.ndarray        # (n, 3) contact midpoints
    dist: jnp.ndarray       # (n,) efc pos (includemargin already subtracted)
    include: jnp.ndarray    # (n,) bool
    frame: jnp.ndarray      # (n, 3, 3) rows = (normal, t1, t2)
    sign: np.ndarray        # static (n, nv): +1 body2-chain, -1 body1-chain
    params: object          # ContactParams
    dyn_friction: bool = False


def build_rows(sets, cdof, com_dof, qvel, nv, friction=None):
    """sets: list of ContactSet; cdof: (nv, 6); com_dof: (nv, 3); qvel (nv,).

    Returns sv.EfcRows with Jc = tuple of nv (R,) arrays.
    """
    Js, arefs, Ds, masks = [], [], [], []
    cdof_ang = cdof[:, :3]
    cdof_lin = cdof[:, 3:]
    for s in sets:
        p = s.params
        n = s.pos.shape[0]
        if s.dyn_friction and friction is not None:
            mu = jnp.maximum(friction, sv.MJ_MINMU)
            mu1 = mu2 = mu
        else:
            mu1, mu2 = p.friction
        tc, dr = p.solref
        dmax = max(p.solimp[0], p.solimp[1])
        imp = sv.impedance(s.dist, p.solimp)          # (n,)
        k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
        b = 2.0 / (dmax * tc)
        rel = s.pos[:, None, :] - com_dof[None, :, :]        # (n, nv, 3)
        Jpt = (cdof_lin[None] + jnp.cross(cdof_ang[None], rel))
        Jpt = Jpt * jnp.asarray(s.sign, Jpt.dtype)[:, :, None]
        # J3: (n, 3dirs, nv)
        J3 = jnp.einsum("ndk,njk->ndj", s.frame, Jpt)
        inc = jnp.where(s.include, 1.0, 0.0)
        for mu, t_idx in ((mu1, 1), (mu2, 2)):
            dA = 2.0 * mu * mu * (1.0 + mu * mu) * p.invweight
            R = jnp.maximum(sv.MJ_MINVAL, (1.0 - imp) / imp * dA)  # (n,)
            D = 1.0 / R
            for sgn in (1.0, -1.0):
                rows = J3[:, 0, :] + sgn * mu * J3[:, t_idx, :]   # (n, nv)
                vel = rows @ qvel
                Js.append(rows)
                arefs.append(-b * vel - k * imp * s.dist)
                Ds.append(D)
                masks.append(inc)
    J = jnp.concatenate(Js, axis=0)        # (Rtot, nv)
    Jc = tuple(J[:, j] for j in range(nv))
    return sv.EfcRows(Jc=Jc, aref=jnp.concatenate(arefs),
                      D=jnp.concatenate(Ds), mask=jnp.concatenate(masks))


# ------------------------------------------------------- static sign masks

def chain_sign(nv, body2_dofs, body1_dofs=()):
    s = np.zeros(nv)
    s[list(body2_dofs)] = 1.0
    s[list(body1_dofs)] = -1.0
    return s


def sign_matrix(nv, n, body2_dofs, body1_dofs=()):
    return np.tile(chain_sign(nv, body2_dofs, body1_dofs), (n, 1))


FLOOR_FRAME = np.array([[0.0, 0.0, 1.0],
                        [0.0, 1.0, 0.0],
                        [-1.0, 0.0, 0.0]])


def floor_frames(n):
    return jnp.asarray(np.tile(FLOOR_FRAME, (n, 1, 1)))
