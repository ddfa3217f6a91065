"""int8 quantization stack: JAX simulator == native C++ runtime, reference
round/clip shims, float-policy closeness, TFLite export round-trip."""

import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from balance_robot_tpu.models import mlp
from balance_robot_tpu.ops import quant


@pytest.fixture(scope="module")
def qm():
    params = mlp.init_params(jax.random.PRNGKey(0))
    return params, quant.quantize_policy(params)


def test_obs_quantize_reference_semantics(qm):
    """np.round + zero_point then clip to [-128, 127]
    (RobotMoveBaseEnv.py:184-192)."""
    _, q = qm
    obs = jnp.array([1e6, -1e6, 0.0, 0.1, -0.1, 0.05])
    qv = np.asarray(quant.quantize_obs(obs, q.in_q))
    assert qv.max() == 127 and qv.min() == -128     # clip, not wraparound
    ref = np.clip(np.round(np.asarray(obs) / q.in_q.scale)
                  + q.in_q.zero_point, -128, 127)
    np.testing.assert_array_equal(qv, ref.astype(np.int8))


def test_int8_close_to_float(qm):
    params, q = qm
    rng = np.random.default_rng(0)
    obs = rng.uniform(-1, 1, (64, 6)).astype(np.float32)
    fa = np.asarray(mlp.policy_mean(params, jnp.asarray(obs)))
    qa = np.asarray(quant.int8_policy_fn(q)(jnp.asarray(obs)))
    assert np.abs(fa - qa).max() < 0.05


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_runtime_bit_exact(qm):
    from balance_robot_tpu.export.native_runtime import NativeInt8Policy
    _, q = qm
    native = NativeInt8Policy(q)
    rng = np.random.default_rng(1)
    for _ in range(100):
        obs = rng.uniform(-3, 3, 6).astype(np.float32)
        q_obs = np.asarray(quant.quantize_obs(jnp.asarray(obs), q.in_q))
        jax_q = np.asarray(quant.int8_forward(q, jnp.asarray(q_obs)))
        nat_q = native.invoke_int8(q_obs)
        np.testing.assert_array_equal(jax_q, nat_q)


def test_brq_roundtrip(tmp_path, qm):
    from balance_robot_tpu.export import pipeline
    _, q = qm
    pipeline.save_brq(q, tmp_path / "p.brq.npz")
    q2 = pipeline.load_brq(tmp_path / "p.brq.npz")
    obs = jnp.linspace(-1, 1, 6)
    a = quant.int8_policy_fn(q)(obs)
    b = quant.int8_policy_fn(q2)(obs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tflite_export(tmp_path, qm):
    tf = pytest.importorskip("tensorflow")
    from balance_robot_tpu.export import pipeline
    params, _ = qm
    sm = tmp_path / "saved_model"
    pipeline.export_savedmodel(params, sm)
    tfl = pipeline.quantize_tflite(sm, tmp_path / "int8.tflite")
    interp = tf.lite.Interpreter(model_path=str(tfl))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    assert inp["dtype"] == np.int8
    iscale, izp = inp["quantization"]
    outs = interp.get_output_details()
    act_out = next(o for o in outs if list(o["shape"]) == [1, 2]
                   and "log_std" not in o["name"])
    oscale, ozp = act_out["quantization"]
    rng = np.random.default_rng(2)
    for _ in range(10):
        obs = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
        qv = np.clip(np.round(obs / iscale) + izp, -128, 127).astype(np.int8)
        interp.set_tensor(inp["index"], qv[None])
        interp.invoke()
        out = interp.get_tensor(act_out["index"])[0]
        act = oscale * (out.astype(np.float32) - ozp)
        ref = np.asarray(mlp.policy_mean(params, jnp.asarray(obs)[None])[0])
        assert np.abs(act - ref).max() < 0.1, (act, ref)
    # model.h writer
    hh = pipeline.write_model_h(tfl, tmp_path / "model.h")
    text = (tmp_path / "model.h").read_text()
    assert "unsigned char model[]" in text and "model_len" in text
