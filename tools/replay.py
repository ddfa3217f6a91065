"""Replay a recorded trajectory through real MuJoCo for visual confirmation.

The TPU framework trains headless; rendering is host-side replay through the
actual reference scenes (acceptable: rendering is not on the training path —
SURVEY §2.1).  Usage:

    python tools/replay.py traj.npz [--env Env01-v1] [--out movie.mp4]

With no GL available, use --print to dump the pitch trace instead.
"""

import argparse
import sys

import numpy as np

SCENES = {
    "Env01-v1": "env01_v1.xml", "Env01-v2": "env01_v1.xml",
    "Env01-v3": "env01_v1.xml", "Env02-v1": "env02_v1.xml",
    "Env03-v1": "env03_v1.xml", "Env03-v2": "env03_v1.xml",
    "Env03-v1-fail": "env03_v1_fail.xml", "Cal01": "env01_v1.xml",
    "EnvMove05-v1": "envMove05_v1.xml",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("traj")
    p.add_argument("--env", default="Env01-v1")
    p.add_argument("--out", default=None, help="mp4 output (needs GL)")
    p.add_argument("--print", dest="print_only", action="store_true")
    args = p.parse_args()

    data = np.load(args.traj)
    qpos = data["qpos"]
    print(f"{len(qpos)} control steps ({len(qpos) * 0.005:.2f} s)")

    if args.print_only or args.out is None:
        from scipy.spatial.transform import Rotation
        for i in range(0, len(qpos), max(1, len(qpos) // 40)):
            q = qpos[i, 3:7]
            pitch = Rotation.from_quat(
                [q[1], q[2], q[3], q[0]]).as_euler("xyz")[0]
            bar = "#" * int(abs(pitch) * 40)
            print(f"t={i * 0.005:6.2f}s pitch={np.degrees(pitch):+7.2f} {bar}")
        return

    import mujoco
    m = mujoco.MjModel.from_xml_path(
        f"/root/reference/src/balance_robot/envs/{SCENES[args.env]}")
    d = mujoco.MjData(m)
    try:
        import imageio
        renderer = mujoco.Renderer(m, 480, 640)
        frames = []
        for i in range(0, len(qpos), 2):   # ~100 fps -> 50 fps video
            d.qpos[:len(qpos[i])] = qpos[i]
            mujoco.mj_forward(m, d)
            renderer.update_scene(d)
            frames.append(renderer.render())
        imageio.mimwrite(args.out, frames, fps=50)
        print(f"wrote {args.out}")
    except Exception as e:
        print(f"rendering unavailable ({e}); use --print", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
