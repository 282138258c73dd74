"""Nonlinear solvers (reference layer L5: include/slam/NonlinearSolver_*.h).

Shared contract (NonlinearSolver_Base.h): construct over a GraphSystem +
linear solver, then ``optimize(max_iters, min_dx_norm)`` and/or
``incremental_step(...)``; expose ``chi2()`` (denormalized) and timing stats.
"""

from slampp_tpu.solvers.gauss_newton import GaussNewtonSolver
from slampp_tpu.solvers.lm import LevenbergMarquardtSolver
from slampp_tpu.solvers.dogleg import DoglegSolver
from slampp_tpu.solvers.incremental import IncrementalSolver
