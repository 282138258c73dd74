"""Linear solvers (reference layer L3: include/slam/LinearSolver_*.h).

Uniform contract (the reference's tag-dispatched ``Solve_PosDef`` /
``SymbolicDecomposition_Blocky`` / ``Solve_PosDef_Blocky``,
LinearSolverTags.h:64-133): a solver exposes ``solve(H, b) -> x`` on device
arrays, optionally with a cached host-side symbolic phase keyed on the graph
structure.
"""

from slampp_tpu.linear.dense import solve_dense, solve_spd
