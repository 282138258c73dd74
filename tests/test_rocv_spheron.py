"""End-to-end ROCV and Spheron problems: parse -> detect -> solve -> chi2
drops (VERDICT r1 item 6; reference ParsePrimitives.h:46-1676, ROCV_Types.h,
BA_Types.h:996)."""

import os
import tempfile

import pytest

from slampp_tpu.io.datasets import make_rocv, make_spheron
from slampp_tpu.io.parser import build_system, detect_problem, parse_file
from slampp_tpu.solvers.gauss_newton import GaussNewtonSolver


def _parse(text):
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return parse_file(path)
    finally:
        os.unlink(path)


def test_rocv_end_to_end():
    text, _ = make_rocv(n_steps=25, seed=0)
    recs = _parse(text)
    assert detect_problem(recs) == "rocv"
    system = build_system(recs)
    gn = GaussNewtonSolver(system)
    chi0 = gn.chi2()
    gn.optimize(max_iterations=15)
    assert gn.chi2() < 0.1 * chi0


def test_spheron_end_to_end():
    text, _ = make_spheron(n_poses=6, n_points=25, seed=0)
    recs = _parse(text)
    assert detect_problem(recs) == "spheron"
    system = build_system(recs)
    gn = GaussNewtonSolver(system)
    chi0 = gn.chi2()
    gn.optimize(max_iterations=15)
    assert gn.chi2() < 0.7 * chi0


def test_unknown_token_with_text_payload_is_hard_error():
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("EDGE2 0 1 1.0 0.0 0.1 400 0 0 400 0 2500\nWEIRD_TOKEN foo bar\n")
        path = f.name
    try:
        with pytest.raises(ValueError, match="unknown token"):
            parse_file(path)
    finally:
        os.unlink(path)
