"""ONNX export + native runtime leg (reference sb_rl.py:86-133, :185-230).

Covers the round trip the reference validates manually: params ->
torch.onnx.export (opset 11) -> check_model -> numpy-executor inference ->
float parity with the JAX policy; plus checker rejection of broken graphs.
"""

import numpy as np
import pytest

import jax

from balance_robot_tpu.models import mlp
from balance_robot_tpu.export import onnx_runtime


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from balance_robot_tpu.export import pipeline
    params = mlp.init_params(jax.random.PRNGKey(3))
    path = tmp_path_factory.mktemp("onnx") / "best_model.onnx"
    pipeline.export_onnx(params, path)
    return params, path


def test_export_and_check(exported):
    _, path = exported
    model = onnx_runtime.load_model(path)
    assert model["opsets"].get("", model["opsets"].get("ai.onnx")) == 11
    onnx_runtime.check_model(model)   # raises on structural problems
    sess = onnx_runtime.NumpySession(path)
    assert sess.get_inputs()[0].name == "input"
    # reference convert names the FIRST output 'output' (sb_rl.py:131);
    # it must be the actions tensor (SB3 policy.forward order)
    assert sess.get_outputs()[0].name == "output"


def test_numpy_executor_matches_jax_policy(exported):
    """The full export->parse->execute chain reproduces policy_mean and
    value to float tolerance (the reference checks this only by eyeballing
    robot behavior across runtimes, README.md:83-116)."""
    params, path = exported
    sess = onnx_runtime.NumpySession(path)
    outs = [o.name for o in sess.get_outputs()]
    rng = np.random.default_rng(0)
    for _ in range(5):
        obs = rng.uniform(-3, 3, size=(1, 6)).astype(np.float32)
        actions, value, log_std = sess.run(outs, {"input": obs})
        np.testing.assert_allclose(
            actions[0], np.asarray(mlp.policy_mean(params, obs[0])),
            atol=1e-6)
        np.testing.assert_allclose(
            value[0, 0], float(mlp.value(params, obs[0])), atol=1e-6)
        np.testing.assert_allclose(
            log_std[0], np.asarray(params["log_std"]), atol=1e-6)
        assert actions.shape == (1, 2) and value.shape == (1, 1)


def test_checker_rejects_corrupt_graph(exported):
    _, path = exported
    model = onnx_runtime.load_model(path)
    # dangling node input
    bad = {**model, "graph": {**model["graph"]}}
    bad["graph"]["nodes"] = [dict(model["graph"]["nodes"][0])] \
        + model["graph"]["nodes"][1:]
    bad["graph"]["nodes"][0] = {**bad["graph"]["nodes"][0],
                                "input": ["does_not_exist"]}
    with pytest.raises(onnx_runtime.OnnxValidationError, match="not produced"):
        onnx_runtime.check_model(bad)
    # unsupported op
    bad2 = {**model, "graph": {**model["graph"]}}
    bad2["graph"]["nodes"] = [{**model["graph"]["nodes"][0],
                               "op_type": "LSTM"}] \
        + model["graph"]["nodes"][1:]
    with pytest.raises(onnx_runtime.OnnxValidationError, match="unsupported"):
        onnx_runtime.check_model(bad2)
    # truncated file is caught at parse time
    with pytest.raises(Exception):
        onnx_runtime.load_model(path.read_bytes()[: len(path.read_bytes())
                                                  // 2])


def test_opset13_axes_as_input():
    """opset >= 13 moves Unsqueeze/Squeeze axes from an attribute to a
    second input; the checker admits opsets up to 17, so the executor must
    run that form (a checked-then-KeyError crash is a contract violation)."""
    from balance_robot_tpu.export import onnx_writer as w

    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    inits = [w._tensor("data", data),
             w._tensor("axes", np.asarray([0.0], np.float32))]
    nodes = [w._node("Unsqueeze", ["data", "axes"], ["u"], "unsq"),
             w._node("Squeeze", ["u", "axes"], ["out"], "sq")]
    graph = b"".join(w._ld(1, n) for n in nodes)
    graph += w._string(2, "opset13_axes")
    graph += b"".join(w._ld(5, t) for t in inits)
    graph += w._ld(12, w._value_info("out", (2, 3)))
    opset = w._string(1, "") + w._int(2, 13)
    model_bytes = (w._int(1, 7) + w._string(2, "test")
                   + w._ld(7, graph) + w._ld(8, opset))

    sess = onnx_runtime.NumpySession(model_bytes)
    (out,) = sess.run(["out"], {})
    np.testing.assert_array_equal(out, data)

    # negative axes are relative to the OUTPUT rank (opset 13 semantics)
    node = {"op_type": "Unsqueeze", "attrs": {}}
    u = onnx_runtime._op_unsqueeze(node, data, np.asarray([-1]))
    assert u.shape == (2, 3, 1)
    # opset <= 12 Unsqueeze with no axes anywhere -> clean validation error
    with pytest.raises(onnx_runtime.OnnxValidationError, match="axes"):
        onnx_runtime._op_unsqueeze(node, data)


def test_session_episode_loop(exported):
    """The test-onnx leg end-to-end: session drives a short env rollout
    (the reference's episode loop, sb_rl.py:214-230)."""
    import balance_robot_tpu as brt
    import jax.numpy as jnp

    params, path = exported
    env = brt.make("Env01-v1")
    sess = onnx_runtime.session(path)
    inp = sess.get_inputs()[0].name
    out = sess.get_outputs()[0].name
    step = jax.jit(env.step)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    for _ in range(5):
        a = sess.run([out], {inp: np.asarray(obs, np.float32)[None, :]})[0][0]
        state, obs, r, term, trunc = step(state, jnp.asarray(a))
        assert np.isfinite(float(r))


def test_native_cpp_session_matches_jax(exported):
    """The C++ ONNX executor (native/onnx_runtime.cc, the reference's
    ORT-C++ leg) agrees with the JAX policy and the numpy executor."""
    from balance_robot_tpu.export.native_runtime import NativeOnnxSession

    params, path = exported
    try:
        sess = NativeOnnxSession(path)
    except Exception as e:                    # no g++/make in env
        pytest.skip(f"native build unavailable: {e}")
    assert sess.get_outputs()[0].name == "output"
    assert sess.get_inputs()[0].name == "input"
    rng = np.random.default_rng(1)
    for _ in range(5):
        obs = rng.uniform(-3, 3, size=(1, 6)).astype(np.float32)
        actions, value, log_std = sess.run(
            [o.name for o in sess.get_outputs()], {"input": obs})
        np.testing.assert_allclose(
            actions[0], np.asarray(mlp.policy_mean(params, obs[0])),
            atol=1e-6)
        np.testing.assert_allclose(
            value[0, 0], float(mlp.value(params, obs[0])), atol=1e-6)
        np.testing.assert_allclose(
            log_std[0], np.asarray(params["log_std"]), atol=1e-6)
    with pytest.raises(RuntimeError):
        sess.run(["output"], {"input": np.zeros((1, 999), np.float32)})


def _offpolicy_params(key, head):
    """Flat checkpoint-style tree of a train/offpolicy.py actor (ReLU MLP
    256-256, head width 4 for SAC [mean, log_std] / 2 for TD3/DDPG)."""
    ks = jax.random.split(key, 6)
    dims = [(6, 32), (32, 32), (32, head)]
    p = {}
    for i, (m, n) in enumerate(dims):
        p[f"actor/{i}/w"] = np.asarray(
            jax.random.normal(ks[2 * i], (m, n)) * 0.3, np.float32)
        p[f"actor/{i}/b"] = np.asarray(
            jax.random.normal(ks[2 * i + 1], (n,)) * 0.1, np.float32)
    return p


@pytest.mark.parametrize("head", [4, 2])
def test_offpolicy_actor_onnx_roundtrip(tmp_path, head):
    """SAC (4-wide [mean, log_std] head) and TD3/DDPG (2-wide) checkpoints
    export a deterministic Gemm/Relu/Tanh actor graph — no Exp, the op that
    blocks the reference's SAC int8 deployment (reference
    README.md:177-180) — and the executed graph matches tanh(mean) of the
    float actor (offpolicy.py SAC.act deterministic branch)."""
    from balance_robot_tpu.export import pipeline

    params = _offpolicy_params(jax.random.PRNGKey(head), head)
    path = tmp_path / "actor.onnx"
    pipeline.export_onnx(params, path)
    model = onnx_runtime.load_model(path)
    onnx_runtime.check_model(model)
    ops = {n["op_type"] for n in model["graph"]["nodes"]}
    assert "Exp" not in ops and ops <= {"Gemm", "Relu", "Tanh"}

    sess = onnx_runtime.NumpySession(path)
    rng = np.random.default_rng(1)
    for _ in range(5):
        obs = rng.uniform(-3, 3, size=(1, 6)).astype(np.float32)
        x = obs
        for i in range(2):
            x = np.maximum(x @ params[f"actor/{i}/w"]
                           + params[f"actor/{i}/b"], 0)
        mean = (x @ params["actor/2/w"] + params["actor/2/b"])[:, :2]
        (out,) = sess.run(["output"], {"input": obs})
        np.testing.assert_allclose(out, np.tanh(mean), rtol=0, atol=2e-6)


def test_offpolicy_brq_gated():
    """The .brq int8 artifact is tanh-MLP-specific; off-policy actors must
    be routed to the TFLite leg with a clear gate, not a bad artifact."""
    from balance_robot_tpu.export import pipeline

    params = _offpolicy_params(jax.random.PRNGKey(0), 4)
    with pytest.raises(NotImplementedError):
        pipeline.export_brq(params, "/tmp/should_not_exist.brq")
