"""Benchmark the REFERENCE's shipped trained policy in our environments.

The reference repo ships exactly one trained artifact: the int8 balance
policy `RobotMovePolicy.tflite` (the pre-trained inner controller for its
move envs, RobotMoveBaseEnv.py:81-97 — i.e. the product of the README's
train-until-it-"balances consistently" workflow, README.md:58-66).  The
reference never measures it quantitatively (no tests, no benchmarks —
SURVEY §4/§6).  This tool produces that number: the reference author's
actual deployed policy, executed faithfully at the int8 level, evaluated
at scale in our trajectory-parity-tested envs — the missing baseline for
the "balances consistently" bar our flagship is judged against.

Method
  1. Extract the pi branch from the flatbuffer via the TF interpreter's
     tensor table (FC→TANH→FC→TANH→FC, weights [out,in], per-tensor quant
     — the graph the reference's own convert pipeline produced).
  2. Re-implement TFLite int8 inference in JAX: int32 accumulate,
     requantize to each op's recorded output scale/zero-point, int8 tanh
     at the pinned 1/128 output scale.  Validated against the REAL TFLite
     interpreter over random int8 inputs before any eval (reports max LSB
     mismatch; aborts if > --max-lsb).
  3. Obs quantize / action dequantize with the reference runtime's exact
     semantics (round-half-even + clip [-128,127]; sb_rl.py:336-357).
  4. Batch-evaluate with the shared ChunkedEvaluator on Env01-v1 /
     Env01-v2 / Env03-v2 (512 episodes each by default), the same
     protocol as every flagship number in README.md.

Usage:
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768 \
      python tools/eval_reference_policy.py --episodes 512 --seed 101
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

REF_TFLITE = "/root/reference/src/balance_robot/envs/RobotMovePolicy.tflite"

ap = argparse.ArgumentParser()
ap.add_argument("--tflite", default=REF_TFLITE)
ap.add_argument("--envs", nargs="+",
                default=["Env01-v1", "Env01-v2", "Env03-v2"])
ap.add_argument("--episodes", type=int, default=512)
ap.add_argument("--seed", type=int, default=101)
ap.add_argument("--validate-n", type=int, default=4096)
ap.add_argument("--max-lsb", type=int, default=1,
                help="abort if the JAX emulation differs from the real "
                     "interpreter by more than this many LSBs anywhere")
ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
args = ap.parse_args()


# ------------------------------------------------------------- extraction
def extract_pi_branch(path):
    """Walk the op graph back from the actions output (output_details[1],
    the [1,2] tensor — sb_rl.py:319-321) and return the three FC layers'
    weights/biases/quant params plus the input/output quant params."""
    import tensorflow as tf
    ip = tf.lite.Interpreter(model_path=path)
    ip.allocate_tensors()
    tens = {d["index"]: d for d in ip.get_tensor_details()}
    ops = [o for o in ip._get_ops_details() if o["op_name"] != "DELEGATE"]

    def producer(tensor_idx):
        for o in ops:
            if tensor_idx in o["outputs"]:
                return o
        raise KeyError(f"no producer for tensor {tensor_idx}")

    out_d = next(d for d in ip.get_output_details()
                 if list(d["shape"]) == [1, 2] and "int8" in d["dtype"].__name__)
    layers = []
    t = out_d["index"]
    for depth in range(3):
        fc = producer(t)
        assert fc["op_name"] == "FULLY_CONNECTED", fc["op_name"]
        x_idx, w_idx, b_idx = fc["inputs"][:3]
        q = lambda i: tens[i]["quantization_parameters"]
        layers.append(dict(
            w=ip.get_tensor(w_idx),                       # [out, in] int8
            b=ip.get_tensor(b_idx).astype(np.int32),      # [out] int32
            # per-output-channel weight scales (quantized_dimension 0)
            w_scale=np.asarray(q(w_idx)["scales"], np.float32),
            out_scale=float(q(fc["outputs"][0])["scales"][0]),
            out_zp=int(q(fc["outputs"][0])["zero_points"][0]),
        ))
        if depth < 2:
            th = producer(x_idx)
            assert th["op_name"] == "TANH", th["op_name"]
            t = th["inputs"][0]
        else:
            assert x_idx == ip.get_input_details()[0]["index"]
            in_q = tens[x_idx]["quantization_parameters"]
    layers.reverse()
    return dict(
        layers=layers,
        in_scale=float(in_q["scales"][0]), in_zp=int(in_q["zero_points"][0]),
        interp=ip, out_detail=out_d,
    )


net = extract_pi_branch(args.tflite)
L = net["layers"]
print(f"pi branch: 6 -> {L[0]['w'].shape[0]} -> {L[1]['w'].shape[0]} -> "
      f"{L[2]['w'].shape[0]}; in q=({net['in_scale']:.6g},{net['in_zp']}) "
      f"out q=({L[2]['out_scale']:.6g},{L[2]['out_zp']})")


# ---------------------------------------------------- faithful JAX forward
import jax          # noqa: E402  (import after TF so the TPU client wins)
import jax.numpy as jnp  # noqa: E402

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

W = [jnp.asarray(l["w"].T.astype(np.int32)) for l in L]     # [in, out]
B = [jnp.asarray(l["b"]) for l in L]
IN_SCALES = [net["in_scale"], 1.0 / 128.0, 1.0 / 128.0]
IN_ZPS = [net["in_zp"], 0, 0]
EFF = [jnp.asarray(IN_SCALES[i] * L[i]["w_scale"] / L[i]["out_scale"])
       for i in range(3)]   # per-output-channel requant multipliers
OUT_ZPS = [l["out_zp"] for l in L]
MID_SCALES = [L[0]["out_scale"], L[1]["out_scale"]]


def ref_int8_forward(q_obs):
    """int8 (..., 6) -> int8 actions (..., 2), reproducing the converted
    graph op-for-op: FC requantizes to its recorded output scale/zp, TANH
    reads that int8 pre-activation and emits at the pinned 1/128 scale."""
    x = q_obs.astype(jnp.int32)
    for i in range(3):
        acc = (x - IN_ZPS[i]) @ W[i] + B[i]
        q = jnp.round(acc.astype(jnp.float32) * EFF[i]) + OUT_ZPS[i]
        x = jnp.clip(q, -128, 127).astype(jnp.int32)
        if i < 2:
            pre = (x - OUT_ZPS[i]).astype(jnp.float32) * MID_SCALES[i]
            x = jnp.clip(jnp.round(jnp.tanh(pre) * 128.0),
                         -128, 127).astype(jnp.int32)
    return x.astype(jnp.int8)


# ------------------------------------------------- validate vs real TFLite
rng = np.random.default_rng(0)
q_in = rng.integers(-128, 128, size=(args.validate_n, 6), dtype=np.int8)
ip, out_d = net["interp"], net["out_detail"]
in_d = ip.get_input_details()[0]
real = np.empty((args.validate_n, 2), np.int8)
for i in range(args.validate_n):
    ip.set_tensor(in_d["index"], q_in[i:i + 1])
    ip.invoke()
    real[i] = ip.get_tensor(out_d["index"])[0]
ours = np.asarray(jax.jit(ref_int8_forward)(jnp.asarray(q_in)))
diff = np.abs(ours.astype(np.int32) - real.astype(np.int32))
print(f"validation vs real TFLite over {args.validate_n} random int8 obs: "
      f"max |diff| = {diff.max()} LSB, mismatched components = "
      f"{(diff > 0).mean():.4%}")
if diff.max() > args.max_lsb:
    sys.exit(f"emulation mismatch {diff.max()} LSB > {args.max_lsb}; refusing")


# ----------------------------------------------------------------- evals
import balance_robot_tpu as brt                       # noqa: E402
from balance_robot_tpu.envs.base import pitch_of, TERMINATE_PITCH  # noqa: E402
from balance_robot_tpu.ops import quant               # noqa: E402
from balance_robot_tpu.train.evaluation import ChunkedEvaluator  # noqa: E402

in_q = quant.QuantTensor(net["in_scale"], net["in_zp"])
out_q = quant.QuantTensor(L[2]["out_scale"], L[2]["out_zp"])


def act_fn(params, obs):
    del params
    q_obs = quant.quantize_obs(obs, in_q)
    return quant.dequantize_action(ref_int8_forward(q_obs), out_q)


for env_id in args.envs:
    env = brt.make(env_id)
    if hasattr(env, "use_pallas_physics"):
        try:
            env.use_pallas_physics()
        except NotImplementedError:
            env.use_fast_solver()
    ev = ChunkedEvaluator(env, act_fn)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
    rets, lens = ev.evaluate_detail(None, keys)
    full = lens >= env.max_episode_steps
    # recoverable-start split, same definition as tools/eval_policy.py:
    # |start pitch| < the 50-degree termination bound
    p0 = jax.jit(jax.vmap(lambda k: pitch_of(env.reset(k)[0].phys.qpos)))(
        keys)
    rec = np.abs(np.asarray(p0)) < TERMINATE_PITCH
    print(f"{env_id}  reference RobotMovePolicy.tflite  "
          f"({args.episodes} deterministic episodes, horizon "
          f"{env.max_episode_steps})")
    print(f"  all                 n={args.episodes:5d}  return mean "
          f"{rets.mean():8.1f}  len mean {lens.mean():6.0f} median "
          f"{np.median(lens):6.0f}  full-horizon {full.mean():6.1%}")
    if rec.any():
        print(f"  recoverable starts  n={rec.sum():5d}  return mean "
              f"{rets[rec].mean():8.1f}  len mean {lens[rec].mean():6.0f} "
              f"median {np.median(lens[rec]):6.0f}  full-horizon "
              f"{full[rec].mean():6.1%}")
