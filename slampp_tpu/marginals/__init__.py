"""Marginal-covariance recovery (reference layer L6: include/slam/Marginals.h,
BAMarginals.h)."""

from slampp_tpu.marginals.marginals import MarginalCovariance, dense_marginals
from slampp_tpu.marginals.ba_marginals import schur_marginals
