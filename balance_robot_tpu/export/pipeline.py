"""Policy export pipeline: params -> ONNX / TF SavedModel -> int8 TFLite ->
model.h — the reference's deployment chain (SURVEY §2.5) without the
external docker step.

Reference chain: SB3 zip -> torch.onnx.export (sb_rl.py:108-133) -> [docker
onnx2tf] -> SavedModel -> quantize_tflite.py -> int8 tflite -> xxd -i.
Native chain here:
  * `export_onnx`: rebuild the pi-network in torch (CPU) with our weights and
    export opset 11, input/output names 'input'/'output' — byte-compatible
    with the reference's convert command surface.
  * `export_savedmodel`: the same network as a tf.Module (outputs the
    (value, actions, log_std) triple like the reference's converted PPO
    graph, sb_rl.py:319-321) -> SavedModel with an 'input' signature.
  * `quantize_tflite`: TFLiteConverter with Optimize.DEFAULT, int8 in/out,
    and the reference's exact 3-row representative envelope
    (quantize_tflite.py:9-33).
  * `write_model_h`: the xxd -i equivalent for MCU embedding (README.md:120).
  * `export_brq`: our own compact int8 artifact (ops/quant.py) consumed by
    the JAX int8 simulator and the native C++ runtime.
"""

import pathlib

import numpy as np


def offpolicy_actor(params):
    """(W, B) layer lists of the deterministic actor if `params` is an
    off-policy checkpoint (train/offpolicy.py tree, flattened by
    checkpoint.save to 'actor/<i>/{w,b}' keys); None for PPO/A2C params.

    Deployment semantics: SAC's head is [mean, log_std] (4-wide) and the
    deterministic action is tanh(mean); TD3/DDPG heads are act_dim wide and
    tanh-squash directly (offpolicy.py SAC.act deterministic branch)."""
    if "actor/0/w" not in params:
        return None
    W, B, i = [], [], 0
    while f"actor/{i}/w" in params:
        W.append(np.asarray(params[f"actor/{i}/w"], np.float32))
        B.append(np.asarray(params[f"actor/{i}/b"], np.float32))
        i += 1
    return W, B


def export_onnx(params, path):
    """ONNX export of the policy (reference `convert` parity: opset 11,
    input 'input', first output 'output' = actions — sb_rl.py:126-133).

    Serialized natively (export/onnx_writer.py): the reference's
    torch.onnx.export path hard-requires the `onnx` pip package, which is
    unavailable here; the graph is six Gemm/Tanh nodes, written directly as
    ModelProto protobuf and validated by onnx_runtime.check_model.  Output
    order matches the reference's export of the SB3 policy module — actions
    FIRST, so the output named 'output' is what the test-onnx episode loop
    acts on (sb_rl.py:214-220).

    Off-policy checkpoints (SAC/TD3/DDPG) export the deterministic actor
    subgraph only (Gemm/Relu/Tanh — see onnx_writer.build_actor_onnx)."""
    from ..models.mlp import deployable_params
    from .onnx_writer import build_actor_onnx, build_policy_onnx

    actor = offpolicy_actor(params)
    if actor is not None:
        pathlib.Path(path).write_bytes(build_actor_onnx(*actor))
        return path
    # privileged-critic training widens vf_w1; the deployed graph keeps the
    # actor's 6-obs interface (mlp.deployable_params docstring)
    pathlib.Path(path).write_bytes(build_policy_onnx(deployable_params(params)))
    return path


def export_savedmodel(params, path):
    """TF SavedModel of the (value, actions, log_std) graph; off-policy
    checkpoints export the deterministic actor ({'actions'} only — the
    relu/tanh graph has no Exp, so int8 TFLite conversion succeeds where
    the reference's SAC export does not, reference README.md:177-180)."""
    import tensorflow as tf

    from ..models.mlp import deployable_params

    actor = offpolicy_actor(params)
    if actor is not None:
        W, B = [[tf.constant(a) for a in t] for t in actor]
        obs_dim = int(actor[0][0].shape[0])
        sac = actor[0][-1].shape[1] == 4       # [mean, log_std] head

        class Actor(tf.Module):
            @tf.function(input_signature=[
                tf.TensorSpec([1, obs_dim], tf.float32, name="input")])
            def __call__(self, x):
                for w, b in zip(W[:-1], B[:-1]):
                    x = tf.nn.relu(x @ w + b)
                x = x @ W[-1] + B[-1]
                if sac:
                    x = x[:, :2]
                return {"actions": tf.tanh(x)}

        tf.saved_model.save(Actor(), str(path))
        return path

    w = {k: np.asarray(v) for k, v in deployable_params(params).items()}

    class Policy(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 6], tf.float32, name="input")])
        def __call__(self, x):
            a = tf.tanh(x @ w["pi_w1"] + w["pi_b1"])
            a = tf.tanh(a @ w["pi_w2"] + w["pi_b2"])
            actions = a @ w["pi_wout"] + w["pi_bout"]
            v = tf.tanh(x @ w["vf_w1"] + w["vf_b1"])
            v = tf.tanh(v @ w["vf_w2"] + w["vf_b2"])
            value = v @ w["vf_wout"] + w["vf_bout"]
            log_std = tf.broadcast_to(
                tf.constant(w["log_std"], tf.float32), (tf.shape(x)[0], 2))
            return {"value": value, "actions": actions, "log_std": log_std}

    tf.saved_model.save(Policy(), str(path))
    return path


REPRESENTATIVE = [
    [-3.14 / 2, -6.28, -4, -4, -4, -4],
    [0, 0, 0, 0, 0, 0],
    [3.14 / 2, 6.28, 4, 4, 4, 4],
]


def quantize_tflite(saved_model_dir, out_path, float32=False):
    """SavedModel -> (int8 by default) .tflite, reference representative set."""
    import tensorflow as tf

    conv = tf.lite.TFLiteConverter.from_saved_model(str(saved_model_dir))
    if not float32:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]

        def rep():
            for row in REPRESENTATIVE:
                yield {"input": np.array([row], np.float32)}

        conv.representative_dataset = rep
        conv.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
            tf.lite.OpsSet.TFLITE_BUILTINS,
        ]
        conv.inference_input_type = tf.int8
        conv.inference_output_type = tf.int8
    blob = conv.convert()
    pathlib.Path(out_path).write_bytes(blob)
    return out_path


def write_model_h(tflite_path, out_path, var_name="model"):
    """xxd -i equivalent: C array for TFLite-Micro embedding."""
    data = pathlib.Path(tflite_path).read_bytes()
    lines = [f"unsigned char {var_name}[] = {{"]
    for i in range(0, len(data), 12):
        chunk = ", ".join(f"0x{b:02x}" for b in data[i:i + 12])
        lines.append(f"  {chunk},")
    lines[-1] = lines[-1].rstrip(",")
    lines.append("};")
    lines.append(f"unsigned int {var_name}_len = {len(data)};")
    pathlib.Path(out_path).write_text("\n".join(lines) + "\n")
    return out_path


def export_brq(params, path):
    """Our compact int8 artifact for the JAX simulator + C++ runtime."""
    if offpolicy_actor(params) is not None:
        # the .brq semantics (ops/quant.py + native/int8_runtime.cc) are
        # defined for the deployed tanh-MLP PPO policy: the relu actor's
        # final tanh squash would need an int8 tanh LUT in both runtimes.
        # The reference-parity int8 deployment for SAC/TD3/DDPG is the
        # TFLite leg (quantize), which carries the op natively.
        raise NotImplementedError(
            "int8 .brq export is defined for the tanh-MLP PPO policy; "
            "use `quantize` (TFLite int8) for off-policy actors")
    from ..ops import quant
    qm = quant.quantize_policy(params)
    save_brq(qm, path)
    return path


def save_brq(qm, path):
    np.savez(path,
             in_scale=qm.in_q.scale, in_zp=qm.in_q.zero_point,
             out_scale=qm.out_q.scale, out_zp=qm.out_q.zero_point,
             w0=qm.w[0], w1=qm.w[1], w2=qm.w[2],
             b0=qm.b[0], b1=qm.b[1], b2=qm.b[2],
             ws0=qm.w_scale[0], ws1=qm.w_scale[1], ws2=qm.w_scale[2],
             a0s=qm.act_q[0].scale, a0z=qm.act_q[0].zero_point,
             a1s=qm.act_q[1].scale, a1z=qm.act_q[1].zero_point,
             a2s=qm.act_q[2].scale, a2z=qm.act_q[2].zero_point)


def load_brq(path):
    from ..ops.quant import QuantizedMLP, QuantTensor
    path = str(path)
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path) as f:
        return QuantizedMLP(
            in_q=QuantTensor(float(f["in_scale"]), int(f["in_zp"])),
            w=(f["w0"], f["w1"], f["w2"]),
            b=(f["b0"], f["b1"], f["b2"]),
            w_scale=(float(f["ws0"]), float(f["ws1"]), float(f["ws2"])),
            act_q=(QuantTensor(float(f["a0s"]), int(f["a0z"])),
                   QuantTensor(float(f["a1s"]), int(f["a1z"])),
                   QuantTensor(float(f["a2s"]), int(f["a2z"]))),
            out_q=QuantTensor(float(f["a2s"]), int(f["a2z"])))
