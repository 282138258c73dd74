"""Manifold / Lie-group math and camera models (reference: include/slam/*SolverBase.h)."""
