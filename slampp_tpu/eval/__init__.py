"""Evaluation & analysis tools (reference layer L11: ErrorEval.h, Eigenvalues.h)."""

from slampp_tpu.eval.error_eval import ate_rmse, rpe_rmse, rpe_aa_rmse, align_umeyama
