"""Smoke tests for the research/example apps (reference L12 apps —
slam_compact_pose_example, slam_dataassoc_example, incremental_ba_3dv,
ba_parameter_acra, geometry_example)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=600):
    env = dict(os.environ, SLAMPP_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_compact_pose_example():
    out = _run("compact_pose_example.py", "--poses", "200")
    assert "keyframe ATE" in out
    ate = float(out.rsplit("keyframe ATE compact-vs-full:", 1)[1].split()[0])
    assert ate < 0.5


def test_dataassoc_example():
    out = _run("dataassoc_example.py", "--poses", "150")
    assert "accepted" in out and "rejected" in out


def test_geometry_example():
    out = _run("geometry_example.py")
    assert "P3P" in out and "Kabsch" in out


def test_ba_parameter_acra_example():
    out = _run("ba_parameter_acra_example.py", timeout=900)
    assert out.count("obs):") == 3


def test_incremental_ba_3dv_example():
    out = _run("incremental_ba_3dv_example.py", "--cams", "5", "--points", "40",
               timeout=900)
    assert "consistency markers processed" in out
