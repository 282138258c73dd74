"""Incremental BA with CONSISTENCY_MARKER records (BASELINE.md config 4/5,
reference incremental_ba_3dv pattern)."""

import numpy as np

from slampp_tpu.io.datasets import make_ba_scene_incremental
from slampp_tpu.io.parser import detect_problem, parse_file


def test_incremental_ba_cli(tmp_path):
    from slampp_tpu.apps.main import main

    text, _ = make_ba_scene_incremental(n_cams=6, n_points=50, obs_per_point=4, seed=1)
    assert "CONSISTENCY_MARKER" in text
    ds = tmp_path / "inc_ba.g2o"
    ds.write_text(text)
    rc = main(
        [
            "-i", str(ds), "-nsp", "1", "-mnsi", "2", "--json", "-ns", "-nb",
            "--no-detailed-timing",
        ]
    )
    assert rc == 0


def test_marker_records_parse(tmp_path):
    text, _ = make_ba_scene_incremental(n_cams=4, n_points=30, obs_per_point=3, seed=0)
    ds = tmp_path / "m.g2o"
    ds.write_text(text)
    recs = parse_file(str(ds))
    kinds = [r.kind for r in recs]
    assert kinds.count("marker") == 3
    assert detect_problem(recs) == "ba"
