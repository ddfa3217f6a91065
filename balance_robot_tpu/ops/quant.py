"""int8 post-training quantization + on-TPU int8 inference simulation.

Replaces the reference's TFLite int8 pipeline (quantize_tflite.py + the
embedded interpreter in RobotMoveBaseEnv.py:81-97,179-210) with:

  * `calibrate`: per-tensor affine int8 ranges from a representative dataset
    (the reference uses exactly 3 rows spanning the obs envelope,
    quantize_tflite.py:9-13 — reproduced in REPRESENTATIVE_OBS).
  * `quantize_policy`: full int8 artifact of the pi-network (weights int8
    symmetric per-tensor, biases int32 at scale in*w, activations int8
    affine) producing the (value, actions, log_std) output triple like the
    reference's converted graph (sb_rl.py:319-321).
  * `int8_forward`: batched integer-arithmetic inference in JAX — int8
    matmuls accumulate in int32 on the TPU MXU, requantization uses the
    TFLite fixed-point multiplier (doubling high-mul + rounding
    right-shift), so quantized-policy rollouts run vmapped on TPU.
  * obs quantize / action dequantize helpers with the reference's exact
    round-then-clip-to-[-128,127] semantics (sb_rl.py:336-339,
    RobotMoveBaseEnv.py:184-203; np.round = round-half-to-even).

The same artifact is executed by the native C++ runtime
(native/int8_runtime.cc) for deployment testing; tests assert C++ == JAX.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# the reference's representative dataset (quantize_tflite.py:9-13)
REPRESENTATIVE_OBS = np.array([
    [-3.14 / 2, -6.28, -4, -4, -4, -4],
    [0, 0, 0, 0, 0, 0],
    [3.14 / 2, 6.28, 4, 4, 4, 4],
], np.float32)


class QuantTensor(NamedTuple):
    scale: float
    zero_point: int


class QuantizedMLP(NamedTuple):
    """int8 artifact of the actor network 6 -> 64 -> 64 -> 2."""
    in_q: QuantTensor
    w: tuple            # 3 int8 weight matrices
    b: tuple            # 3 int32 biases
    w_scale: tuple      # 3 python floats
    act_q: tuple        # quant params after each layer (h1, h2, out)
    out_q: QuantTensor  # == act_q[-1]


def _affine_range(lo, hi):
    """TFLite-style asymmetric int8 affine params with zero exactly
    representable."""
    lo = min(float(lo), 0.0)
    hi = max(float(hi), 0.0)
    scale = (hi - lo) / 255.0 if hi > lo else 1.0
    zp = int(round(-128 - lo / scale))
    zp = max(-128, min(127, zp))
    return QuantTensor(scale=scale, zero_point=zp)


def calibrate_activations(params, rep_obs, forward_fns):
    """Run the float net over the representative set, record min/max per
    activation."""
    ranges = []
    x = rep_obs
    for fn in forward_fns:
        x = fn(x)
        ranges.append(_affine_range(np.min(x), np.max(x)))
    return ranges


def quantize_policy(params, rep_obs=REPRESENTATIVE_OBS):
    """Post-training int8 quantization of the pi network."""
    import numpy as np
    W = [np.asarray(params["pi_w1"]), np.asarray(params["pi_w2"]),
         np.asarray(params["pi_wout"])]
    B = [np.asarray(params["pi_b1"]), np.asarray(params["pi_b2"]),
         np.asarray(params["pi_bout"])]
    in_q = _affine_range(np.min(rep_obs), np.max(rep_obs))

    def l1(x):
        return np.tanh(x @ W[0] + B[0])

    def l2(x):
        return np.tanh(x @ W[1] + B[1])

    def l3(x):
        return x @ W[2] + B[2]

    act_q = calibrate_activations(params, rep_obs, [l1, l2, l3])
    # tanh outputs are in [-1,1]: TFLite pins tanh output scale to 1/128
    act_q[0] = QuantTensor(scale=1.0 / 128.0, zero_point=0)
    act_q[1] = QuantTensor(scale=1.0 / 128.0, zero_point=0)

    wq, bq, wsc = [], [], []
    scales_in = [in_q.scale, act_q[0].scale, act_q[1].scale]
    for i in range(3):
        s = float(np.max(np.abs(W[i])) / 127.0) or 1.0
        wq.append(np.clip(np.round(W[i] / s), -127, 127).astype(np.int8))
        wsc.append(s)
        bq.append(np.round(B[i] / (s * scales_in[i])).astype(np.int32))
    return QuantizedMLP(in_q=in_q, w=tuple(wq), b=tuple(bq),
                        w_scale=tuple(wsc), act_q=tuple(act_q),
                        out_q=act_q[2])


# ------------------------------------------------------------------ runtime

def int8_forward(qm: QuantizedMLP, q_obs):
    """Batched int8 inference: q_obs int8 (..., 6) -> int8 actions (..., 2).

    Integer matmuls accumulate in int32 (int8 x int8 -> int32 maps onto the
    TPU MXU for batched calls); requantization is float32 round-half-even —
    the .brq artifact's defined semantics, reproduced bit-identically by the
    native C++ runtime (int32 accumulators are <= 2^22 here, exactly
    representable in f32, so the float requant is deterministic across
    TPU / CPU / C++).
    """
    x = q_obs
    scales_in = [qm.in_q, qm.act_q[0], qm.act_q[1]]
    zps = [qm.in_q.zero_point, 0, 0]
    for i in range(3):
        w = jnp.asarray(qm.w[i], jnp.int8)
        acc = ((x.astype(jnp.int32) - zps[i]) @ w.astype(jnp.int32)
               + jnp.asarray(qm.b[i], jnp.int32))
        if i < 2:
            # requantize accumulator to the pre-activation float, tanh,
            # quantize at the fixed tanh scale 1/128
            eff = scales_in[i].scale * qm.w_scale[i]
            pre = acc.astype(jnp.float32) * eff
            q = jnp.round(jnp.tanh(pre) * 128.0)
            x = jnp.clip(q, -128, 127).astype(jnp.int8)
        else:
            eff = scales_in[i].scale * qm.w_scale[i] / qm.out_q.scale
            out = (jnp.round(acc.astype(jnp.float32) * eff)
                   .astype(jnp.int32) + qm.out_q.zero_point)
            x = jnp.clip(out, -128, 127).astype(jnp.int8)
    return x


def quantize_obs(obs, q: QuantTensor):
    """Reference obs quantization: np.round(obs/scale)+zp, clip [-128,127]
    (RobotMoveBaseEnv.py:184-192 — the clip guards int8 wraparound)."""
    q_ = jnp.round(obs / q.scale) + q.zero_point
    return jnp.clip(q_, -128, 127).astype(jnp.int8)


def dequantize_action(q_act, q: QuantTensor):
    """scale * (q - zero_point) (RobotMoveBaseEnv.py:197-203)."""
    return q.scale * (q_act.astype(jnp.float32) - q.zero_point)


def int8_policy_fn(qm: QuantizedMLP):
    """float obs -> float actions through the full int8 path (the hierarchical
    move envs run this vmapped inside env.step)."""
    def fn(obs):
        q_obs = quantize_obs(obs, qm.in_q)
        q_act = int8_forward(qm, q_obs)
        return dequantize_action(q_act, qm.out_q)
    return fn
