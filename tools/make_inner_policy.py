"""Generate the embedded int8 inner balance policy for the move envs.

The reference ships a pre-trained RobotMovePolicy.tflite
(RobotMoveBaseEnv.py:81-97); this framework generates its own from a trained
balance checkpoint:

    python tools/make_inner_policy.py models/Env01-v2_PPO/best_model

writes balance_robot_tpu/envs/assets/inner_policy.brq.npz (JAX sim + native
runtime artifact) and inner_policy.tflite (real TFLite int8, for the MCU).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from balance_robot_tpu.train import checkpoint
from balance_robot_tpu.export import pipeline


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "models/Env01-v2_PPO/best_model"
    params = checkpoint.load(src)
    assets = (pathlib.Path(__file__).parent.parent / "balance_robot_tpu"
              / "envs" / "assets")
    assets.mkdir(exist_ok=True)
    pipeline.export_brq(params, assets / "inner_policy.brq")
    print(f"wrote {assets / 'inner_policy.brq'}.npz")
    try:
        sm = assets / "_saved_model_tmp"
        pipeline.export_savedmodel(params, sm)
        pipeline.quantize_tflite(sm, assets / "inner_policy.tflite")
        print(f"wrote {assets / 'inner_policy.tflite'}")
    except Exception as e:
        print(f"tflite export skipped: {e}")


if __name__ == "__main__":
    main()
