"""End-to-end smoke of the burst ratchet's honest accept machinery.

Round-5 methodology fix (docs/TRAINING.md round-5 section): burst_refine.py
now auto-sets min_win = 2*SE, demands the margin on the disjoint confirm
set, and runs a pooled fresh-seed final gate that can revert the artifact.
Those paths only execute on an ACCEPT, which a plateaued flagship rarely
produces — so this test drives the script end-to-end on a short-horizon
env with a forced-accept margin (--min-win -1) and checks the
machine-readable outcome (burst_history.json: accepted flag, min_win,
pooled gate numbers or a gate revert).

No reference analogue (the reference's accept gate is eyeballing SB3
reward curves, reference README.md:58-66); this guards OUR selection
methodology, which SURVEY §4 requires to beat that bar.
"""
import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_burst_refine_confirm_and_gate(tmp_path):
    driver = tmp_path / "drive.py"
    out_dir = tmp_path / "out"
    init = REPO / "models" / "Env01-v2_PPO" / "best_model.npz"
    # Wrap brt.make so every env (train + eval) runs a 40-step horizon:
    # the real Env01 horizon (6000) makes CPU evals minutes-long, and this
    # smoke is about the accept/confirm/gate control flow, not the policy.
    driver.write_text(f"""
import runpy, sys
sys.path.insert(0, {str(REPO)!r})
import balance_robot_tpu as brt
_orig_make = brt.make
def _short_make(env_id):
    e = _orig_make(env_id)
    e.max_episode_steps = 40
    return e
brt.make = _short_make
sys.argv = ["burst_refine.py",
    "--env", "Env01-v1", "--init", {str(init)!r},
    "--out", {str(out_dir)!r}, "--platform", "cpu",
    "--bursts", "1", "--burst-steps", "256", "--snap-steps", "128",
    "--envs", "8", "--steps", "16", "--mb", "32", "--epochs", "1",
    "--eval-episodes", "4", "--confirm", "--min-win", "-1.0",
    "--max-wall", "600"]
runpy.run_path({str(REPO / "tools" / "burst_refine.py")!r},
               run_name="__main__")
""")
    proc = subprocess.run(
        [sys.executable, str(driver)], cwd=REPO, timeout=900,
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    hist = json.loads((out_dir / "burst_history.json").read_text())
    assert "accepted" in hist and "min_win" in hist
    assert (out_dir / "best_model.npz").is_file()
    if hist["accepted"]:
        # the pooled fresh-seed gate must have run and kept the winner
        assert hist["best"]["pooled"]["winner"] >= \
            hist["best"]["pooled"]["incumbent"]
    elif "reverted_by_gate" in hist["best"]:
        # accept happened mid-run but the gate overruled it: the artifact
        # must be the incumbent again and the gate numbers recorded
        assert hist["best"]["pooled"]["winner"] < \
            hist["best"]["pooled"]["incumbent"]
    assert "DONE accepted=" in proc.stdout


@pytest.mark.slow
def test_burst_refine_auto_min_win(tmp_path):
    """Without --min-win the script derives 2*SE from the incumbent's eval
    and rejects sub-noise wins (the r3a/r4h failure mode)."""
    driver = tmp_path / "drive.py"
    out_dir = tmp_path / "out"
    init = REPO / "models" / "Env01-v2_PPO" / "best_model.npz"
    driver.write_text(f"""
import runpy, sys
sys.path.insert(0, {str(REPO)!r})
import balance_robot_tpu as brt
_orig_make = brt.make
def _short_make(env_id):
    e = _orig_make(env_id)
    e.max_episode_steps = 40
    return e
brt.make = _short_make
sys.argv = ["burst_refine.py",
    "--env", "Env01-v1", "--init", {str(init)!r},
    "--out", {str(out_dir)!r}, "--platform", "cpu",
    "--bursts", "0", "--eval-episodes", "16", "--confirm",
    "--max-wall", "600"]
runpy.run_path({str(REPO / "tools" / "burst_refine.py")!r},
               run_name="__main__")
""")
    proc = subprocess.run(
        [sys.executable, str(driver)], cwd=REPO, timeout=900,
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    hist = json.loads((out_dir / "burst_history.json").read_text())
    # 2*SE at n=16 episodes is sizeable; exact value depends on the
    # incumbent's short-horizon survival rate p in [0.05, 0.95]
    assert 2 * (0.05 * 0.95 / 16) ** 0.5 <= hist["min_win"] \
        <= 2 * (0.5 * 0.5 / 16) ** 0.5
    assert hist["accepted"] is False
