"""14-dof fused pallas step: parity with the XLA block path (interpret
mode). The scalar colliders (box-box 24-candidate manifold via where-chains
and pairwise ranks, box-cylinder) were additionally verified machine-exact
(<2e-15) vs real MuJoCo across contact regimes — see docs/PERFORMANCE.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from balance_robot_tpu.physics import block_step as bs
from balance_robot_tpu.physics import pallas_block as pb


def _states(B, rng):
    qpos = np.tile([0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0.25, 0.15, 1, 0, 0, 0],
                   (B, 1)).astype(np.float32)
    qpos[:, :2] += rng.normal(size=(B, 2)) * 0.01
    qpos[:, 9:11] += rng.normal(size=(B, 2)) * 0.05
    qvel = np.zeros((B, 14), np.float32)
    qvel[:, 8:11] = rng.normal(size=(B, 3)) * 2
    qvel[:, 9] -= 3.0                        # block flying at the robot
    return qpos, qvel


def _tup3(v):
    return (v[0], v[1], v[2])


def _rows(R):
    return tuple(tuple(R[r, c] for c in range(3)) for r in range(3))


def _included(pos, dist, inc):
    """Sorted (dist, pos) rows where include is set, as a flat array."""
    rows = [(float(d), *map(float, p))
            for p, d, i in zip(pos, dist, inc) if i]
    return np.array(sorted(rows), np.float32).reshape(-1, 4)


def test_box_box_scalar_matches_array():
    """The kernel-traceable scalar box-box manifold (where-chains + pairwise
    ranks, no gather/sort) emits exactly the same included contact set as
    the array path's argsort-compacted deepest-8 (box_collisions.box_box)."""
    from balance_robot_tpu.physics import box_collisions as bc
    from scipy.spatial.transform import Rotation

    half1 = np.float32([0.05, 0.0185, 0.0855])   # chassis
    half2 = np.float32([0.01, 0.01, 0.01])       # block
    margin = 0.002

    @jax.jit
    def arr(c1, R1, c2, R2):
        pc = bc.box_box(jnp.asarray(c1), jnp.asarray(R1), half1,
                        jnp.asarray(c2), jnp.asarray(R2), half2, margin)
        return pc.pos, pc.dist, pc.include

    @jax.jit
    def sca(c1, R1, c2, R2):
        out = pb.box_box_scalar(_tup3(c1), _rows(R1), tuple(half1),
                                _tup3(c2), _rows(R2), tuple(half2), margin)
        pos = jnp.stack([jnp.stack(p) for (p, d, i, f) in out])
        dist = jnp.stack([d for (p, d, i, f) in out])
        inc = jnp.stack([i for (p, d, i, f) in out])
        return pos, dist, inc

    rng = np.random.default_rng(3)
    n_nonempty = 0
    for k in range(12):
        c1 = np.zeros(3, np.float32)
        R1 = np.float32(Rotation.from_euler(
            "xyz", rng.normal(size=3) * 0.4).as_matrix())
        # block resting on / pressed into the (rotated) chassis top face
        local = np.float32([rng.normal() * 0.02, rng.normal() * 0.008,
                            0.0855 + rng.uniform(-0.004, 0.012)])
        c2 = R1 @ local
        R2 = np.float32(Rotation.from_euler(
            "xyz", rng.normal(size=3)).as_matrix())
        pa, da, ia = arr(c1, R1, c2, R2)
        ps, ds, is_ = sca(c1, R1, c2, R2)
        ra = _included(np.asarray(pa), np.asarray(da), np.asarray(ia))
        rs = _included(np.asarray(ps), np.asarray(ds), np.asarray(is_))
        # values differ by ~1 ulp (matmul vs explicit-sum association);
        # the included set itself must agree exactly
        assert ra.shape == rs.shape, f"config {k}: included sets differ"
        if ra.size:
            np.testing.assert_allclose(ra, rs, rtol=0, atol=1e-7,
                                       err_msg=f"config {k}")
        n_nonempty += ra.shape[0] > 0
    assert n_nonempty >= 4     # the draw must actually exercise contact


def test_box_cylinder_scalar_matches_array():
    from balance_robot_tpu.physics import box_collisions as bc
    from scipy.spatial.transform import Rotation

    half = np.float32([0.01, 0.01, 0.01])
    r, h, margin = 0.034, 0.013, 0.002

    @jax.jit
    def arr(cbox, Rbox, ccyl, axis):
        pc = bc.box_cylinder(jnp.asarray(cbox), jnp.asarray(Rbox), half,
                             jnp.asarray(ccyl), jnp.asarray(axis), r, h,
                             margin)
        return pc.pos, pc.dist, pc.include

    @jax.jit
    def sca(cbox, Rbox, ccyl, axis):
        out = pb.box_cylinder_scalar(_tup3(cbox), _rows(Rbox), tuple(half),
                                     _tup3(ccyl), _tup3(axis), r, h, margin)
        pos = jnp.stack([jnp.stack(p) for (p, d, i, f) in out])
        dist = jnp.stack([d for (p, d, i, f) in out])
        inc = jnp.stack([i for (p, d, i, f) in out])
        return pos, dist, inc

    rng = np.random.default_rng(5)
    n_nonempty = 0
    for k in range(12):
        ccyl = np.zeros(3, np.float32)
        axis = np.float32([1, 0, 0])
        cbox = np.float32([rng.normal() * 0.01,
                           rng.normal() * 0.02,
                           0.034 + rng.uniform(-0.002, 0.015)])
        Rbox = np.float32(Rotation.from_euler(
            "xyz", rng.normal(size=3)).as_matrix())
        pa, da, ia = arr(cbox, Rbox, ccyl, axis)
        ps, ds, is_ = sca(cbox, Rbox, ccyl, axis)
        ra = _included(np.asarray(pa), np.asarray(da), np.asarray(ia))
        rs = _included(np.asarray(ps), np.asarray(ds), np.asarray(is_))
        # values differ by ~1 ulp (matmul vs explicit-sum association);
        # the included set itself must agree exactly
        assert ra.shape == rs.shape, f"config {k}: included sets differ"
        if ra.size:
            np.testing.assert_allclose(ra, rs, rtol=0, atol=1e-7,
                                       err_msg=f"config {k}")
        n_nonempty += ra.shape[0] > 0
    assert n_nonempty >= 4


@pytest.mark.slow
def test_scalar_substep14_matches_xla_through_impact():
    """Slow (scalar-substep CPU compile ~200 s): the kernel-traceable scalar
    substep is bit-identical to the XLA array path over 40 substeps spanning
    a block-robot impact. Collider-level parity runs in the default suite
    (test_box_box_scalar_matches_array)."""
    rng = np.random.default_rng(0)
    qpos, qvel = _states(1, rng)
    st_a = bs.PhysState14(tuple(qpos[0]), tuple(qvel[0]), tuple([0.0] * 14))
    st_b = st_a
    ctrl = tuple((rng.normal(size=2) * 5).astype(np.float32))

    @jax.jit
    def roll(st_a, st_b):
        def body(c, _):
            a, b = c
            return ((bs.substep14(a, ctrl, bs.ENV03_PARAMS),
                     pb.substep14_scalar(b, ctrl, bs.ENV03_PARAMS)), None)
        (a, b), _ = jax.lax.scan(body, (st_a, st_b), None, length=40)
        return a, b

    a, b = roll(st_a, st_b)
    np.testing.assert_array_equal(np.asarray(a.qpos), np.asarray(b.qpos))
    np.testing.assert_array_equal(np.asarray(a.qvel), np.asarray(b.qvel))


@pytest.mark.slow
def test_pallas14_matches_xla_through_impact():
    B = 4
    rng = np.random.default_rng(0)
    qpos, qvel = _states(B, rng)
    ws = np.zeros((B, 14), np.float32)
    ctrl = rng.normal(size=(B, 2)).astype(np.float32) * 5

    ref = jax.jit(jax.vmap(lambda qp, qv, w, c: bs.control_step14(
        bs.PhysState14(tuple(qp), tuple(qv), tuple(w)), tuple(c),
        bs.ENV03_PARAMS, frame_skip=10)))(qpos, qvel, ws, ctrl)
    ref_qp = np.stack([np.asarray(x) for x in ref.qpos], axis=1)

    qp, qv, w = pb.control_step14_pallas(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ws),
        jnp.asarray(ctrl), bs.ENV03_PARAMS, frame_skip=10, interpret=True,
        block_b=4)
    np.testing.assert_array_equal(np.asarray(qp), ref_qp)


@pytest.mark.slow
def test_env03_pallas_env_step():
    import balance_robot_tpu as brt
    from balance_robot_tpu.envs.vector import VecEnv
    envA = brt.make("Env03-v2")
    envB = brt.make("Env03-v2").use_pallas_physics(interpret=True)
    B = 4
    vA, vB = VecEnv(envA, B), VecEnv(envB, B)
    sA, _ = jax.jit(vA.reset)(jax.random.PRNGKey(0))
    sB, _ = jax.jit(vB.reset)(jax.random.PRNGKey(0))
    a = jnp.zeros((B, 2))
    sA, outA = jax.jit(vA.step)(sA, a)
    sB, outB = jax.jit(vB.step)(sB, a)
    # The two paths are DIFFERENTLY-STRUCTURED programs (array-form XLA vs
    # kernel-traceable scalar form interpreted); XLA:CPU's codegen for the
    # big vmapped program varies with host/toolchain, so exact bitwise
    # equality is not stable across environments — observed few-ulp
    # (<1e-13) differences on numerically-zero wheel velocities at the
    # round-3 host (the substep-level scalar-vs-array parity below IS
    # bit-level; this env-step check guards against real regressions, not
    # compiler scheduling).
    np.testing.assert_allclose(np.asarray(outA.obs), np.asarray(outB.obs),
                               atol=1e-10, rtol=0)
