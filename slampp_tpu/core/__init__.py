"""Numeric core: batched residual/Jacobian evaluation and system assembly.

The reference's equivalent layer is the CUberBlockMatrix + reduction-plan
machinery (include/slam/BlockMatrix.h, NonlinearSolver_Lambda_Base.h); here the
"reduction plan" is a set of host-precomputed gather/scatter index arrays and
the assembly is XLA scatter-adds over batched per-edge-type contributions.
"""
