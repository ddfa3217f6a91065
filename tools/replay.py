"""Replay a recorded trajectory through real MuJoCo for visual confirmation.

The TPU framework trains headless; rendering is host-side replay through the
actual reference scenes (acceptable: rendering is not on the training path —
SURVEY §2.1).  Usage:

    python tools/replay.py traj.npz [--env Env01-v1] [--out movie.mp4]

With no GL available, use --print to dump the pitch trace instead.

Recorded trajectories carry only the dofs our physics simulates (9 for the
8-dof scenes, 16 for the Env03 block scenes); scenes with extra decorative
bodies (env03_v1_fail.xml, nq=23) are padded to the scene's nq by
`expand_frames`, which also reproduces the FAIL-mesh drop as a replay-side
animation: the reference teleports the mesh above the fallen robot on first
termination (env03_v1_fail.py:125-140) and lets physics drop it; here the
drop is a kinematic ballistic fall baked into the padded frames.
"""

import argparse
import math
import sys

import numpy as np

SCENES = {
    "Env01-v1": "env01_v1.xml", "Env01-v2": "env01_v1.xml",
    "Env01-v3": "env01_v1.xml", "Env02-v1": "env02_v1.xml",
    "Env03-v1": "env03_v1.xml", "Env03-v2": "env03_v1.xml",
    "Env03-v1-fail": "env03_v1_fail.xml", "Cal01": "env01_v1.xml",
    "EnvMove05-v1": "envMove05_v1.xml",
}

TERMINATE_PITCH = math.radians(50.0)        # env01_v1.py:31
FAIL_PARK = [10.0, 10.0, -2.0, 1.0, 0.0, 0.0, 0.0]   # env03_v1_fail.py:95-97
CONTROL_DT = 0.005


def pitch_trace(qpos):
    """Per-frame pitch from the free-joint quaternion (RobotBaseEnv.py:127)."""
    from scipy.spatial.transform import Rotation
    q = qpos[:, 3:7]
    # guard all-zero quats like the reference's get_pitch
    ok = np.abs(q).sum(axis=1) > 0
    out = np.zeros(len(q))
    if ok.any():
        r = Rotation.from_quat(q[ok][:, [1, 2, 3, 0]])
        out[ok] = r.as_euler("xyz")[:, 0]
    return out


def _fail_drop_quat():
    """The reference's drop orientation, INCLUDING its scrambled raw
    as_quat->qpos assignment ([x,y,z,w] written where MuJoCo reads
    [w,x,y,z], env03_v1_fail.py:132-139) — replay must match as-built."""
    from scipy.spatial.transform import Rotation
    return Rotation.from_euler(
        "xyz", [math.pi / 4, math.pi, math.pi / 2 + math.pi]).as_quat()


def expand_frames(qpos, env, scene_nq):
    """Pad recorded (T, nq_rec) frames to the scene's nq.

    Unrecorded trailing dofs are the fail body's parked free joint; for
    Env03-v1-fail the FAIL mesh additionally drops (kinematic ballistic
    fall from z=0.5 to rest) starting at the first terminated frame —
    the replay-side equivalent of the reference's drop_fail physics event
    (env03_v1_fail.py:125-140)."""
    qpos = np.asarray(qpos)
    T, nq_rec = qpos.shape
    if nq_rec > scene_nq:
        raise ValueError(f"recorded nq={nq_rec} exceeds scene nq={scene_nq}")
    if nq_rec == scene_nq:
        return qpos
    if scene_nq - nq_rec != 7:
        raise ValueError(f"cannot pad nq {nq_rec} -> {scene_nq}: expected "
                         "one extra free joint (7 coords)")
    out = np.concatenate(
        [qpos, np.tile(np.asarray(FAIL_PARK), (T, 1))], axis=1)
    if env == "Env03-v1-fail":
        pitch = pitch_trace(qpos)
        hits = np.nonzero(np.abs(pitch) > TERMINATE_PITCH)[0]
        if hits.size:
            k = int(hits[0])
            rx, ry = qpos[k, 0], qpos[k, 1]
            # reference drop point: (robot_x-0.3, robot_y+0.3, 0.5)
            quat = _fail_drop_quat()
            for i in range(k, T):
                t = (i - k) * CONTROL_DT
                z = max(0.5 - 0.5 * 9.81 * t * t, 0.06)
                out[i, nq_rec:nq_rec + 3] = [rx - 0.3, ry + 0.3, z]
                out[i, nq_rec + 3:] = quat
    return out


def hud_series(qpos):
    """Per-frame HUD values matching the reference's human-render overlays
    (RobotBaseEnv.py:97-125): pitch/yaw from the free-joint quaternion,
    wheel speeds by finite difference of the hinge angles (coords 7/8; the
    right wheel's axis is mirrored, robot-02.xml:11,16), wheel speed/yaw
    via the reference's get_wheel_speed / get_wheel_yaw combinations."""
    from scipy.spatial.transform import Rotation
    q = qpos[:, 3:7]
    ok = np.abs(q).sum(axis=1) > 0
    euler = np.zeros((len(q), 3))
    if ok.any():
        euler[ok] = Rotation.from_quat(
            q[ok][:, [1, 2, 3, 0]]).as_euler("xyz")
    vel = np.zeros((len(qpos), 2))
    vel[1:] = np.diff(qpos[:, 7:9], axis=0) / CONTROL_DT
    speed = (vel[:, 0] - vel[:, 1]) / 2.0     # RobotBaseEnv.py:172-175
    wyaw = vel[:, 0] + vel[:, 1]              # RobotBaseEnv.py:167-170
    return dict(pitch=np.degrees(euler[:, 0]), yaw=np.degrees(euler[:, 2]),
                speed=speed, wheel_yaw=wyaw)


def draw_hud(frame, series, i):
    """Burn the overlay text into a rendered frame (PIL; the reference uses
    the MuJoCo viewer's mjr_overlay, unavailable offscreen)."""
    from PIL import Image, ImageDraw
    img = Image.fromarray(frame)
    d = ImageDraw.Draw(img)
    lines = [f"t      {i * CONTROL_DT:7.2f} s",
             f"Pitch  {series['pitch'][i]:+7.2f} deg",
             f"Speed  {series['speed'][i]:+7.1f} rad/s",
             f"Yaw    {series['yaw'][i]:+7.2f} deg",
             f"W.yaw  {series['wheel_yaw'][i]:+7.1f} rad/s"]
    for k, text in enumerate(lines):
        d.text((8, 8 + 14 * k), text, fill=(255, 255, 255))
    return np.asarray(img)


def follow_camera(mujoco, x, y):
    """Reference camera follow (_update_camera_follow, RobotBaseEnv.py:87-95):
    keep the lookat centered on the robot body."""
    cam = mujoco.MjvCamera()
    cam.lookat[:] = [x, y, 0.1]
    cam.distance, cam.elevation, cam.azimuth = 0.8, -15.0, 90.0
    return cam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("traj")
    p.add_argument("--env", default="Env01-v1")
    p.add_argument("--out", default=None, help="mp4 output (needs GL)")
    p.add_argument("--print", dest="print_only", action="store_true")
    p.add_argument("--hud", action="store_true",
                   help="burn Pitch/Speed/Yaw overlays into the frames and "
                        "follow the robot with the camera (the reference's "
                        "human-render HUD, RobotBaseEnv.py:97-125)")
    args = p.parse_args()

    data = np.load(args.traj)
    qpos = data["qpos"]
    print(f"{len(qpos)} control steps ({len(qpos) * CONTROL_DT:.2f} s)")

    if args.print_only or args.out is None:
        pitch = pitch_trace(qpos)
        for i in range(0, len(qpos), max(1, len(qpos) // 40)):
            bar = "#" * int(abs(pitch[i]) * 40)
            print(f"t={i * CONTROL_DT:6.2f}s "
                  f"pitch={np.degrees(pitch[i]):+7.2f} {bar}")
        return

    import mujoco
    m = mujoco.MjModel.from_xml_path(
        f"/root/reference/src/balance_robot/envs/{SCENES[args.env]}")
    d = mujoco.MjData(m)
    frames_q = expand_frames(qpos, args.env, m.nq)
    hud = hud_series(qpos) if args.hud else None
    try:
        renderer = mujoco.Renderer(m, 480, 640)
        frames = []
        for i in range(0, len(frames_q), 4):   # 200 Hz sim -> 50 fps video
            d.qpos[:] = frames_q[i]
            mujoco.mj_forward(m, d)
            if args.hud:
                renderer.update_scene(d, camera=follow_camera(
                    mujoco, frames_q[i, 0], frames_q[i, 1]))
            else:
                renderer.update_scene(d)
            f = renderer.render()
            frames.append(draw_hud(f, hud, i) if args.hud else f)
    except Exception as e:
        print(f"rendering unavailable ({e}); use --print", file=sys.stderr)
        sys.exit(1)
    try:
        import imageio
        imageio.mimwrite(args.out, frames, fps=50)
        print(f"wrote {args.out}")
    except Exception as e:
        # no ffmpeg backend in this image -> animated GIF via pillow
        import pathlib
        from PIL import Image
        gif = str(pathlib.Path(args.out).with_suffix(".gif"))
        imgs = [Image.fromarray(f).reduce(2) for f in frames[::2]]  # 25 fps
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=40, loop=0)
        print(f"no mp4 encoder ({e}); wrote {gif}")


if __name__ == "__main__":
    main()
