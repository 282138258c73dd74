"""Robust loss functions and IRLS weighting.

Capability parity with the reference's robust-optimization plumbing
(include/slam/RobustUtils.h, include/geometry/RobustLoss.h): the weight
function w(e) = psi(e)/e for each loss, applied multiplicatively to the
information matrix per IRLS (BaseTypes_Binary.h:772).

The reference's default robustification normalizes the error norm by a
scale (16 * 1.4826 by default, RobustUtils.h:74-95) and uses Huber with
parameter 1.345.  ``robustify(edge_type, ...)`` produces a robust variant of
any registered edge type (the analog of adding the CBaseEdge::Robust option).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from slampp_tpu.graph.types import EdgeType, register_edge_type


# weight functions w(e) = psi(e)/e (reference RobustLoss.h operator())
def huber_weight(e, param=1.345):
    """CHuberLoss (RobustLoss.h:55)."""
    return jnp.where(e <= param, 1.0, param / jnp.maximum(e, 1e-300))


def cauchy_weight(e, param=2.3849):
    """CCauchyLoss (RobustLoss.h:111): w = 1/(1 + (e/a)^2)."""
    return 1.0 / (1.0 + (e / param) ** 2)


def tukey_weight(e, param=4.6851):
    """CTukeyBiweightLoss (RobustLoss.h:162): w = (1-(e/c)^2)^2 inside, 0 out."""
    t = 1.0 - (e / param) ** 2
    return jnp.where(e <= param, t * t, 0.0)


def hampel_weight(e, a=1.5, b=3.5, c=8.0):
    """CHampelLoss (RobustLoss.h:214), three-part redescending."""
    w_mid = a / jnp.maximum(e, 1e-300)
    w_tail = a * (c - e) / jnp.maximum((c - b) * e, 1e-300)
    return jnp.where(
        e <= a, 1.0, jnp.where(e <= b, w_mid, jnp.where(e <= c, w_tail, 0.0))
    )


def logistic_weight(e, param=1.205):
    """CLogisticLoss (RobustLoss.h:296): w = tanh(e/a)/(e/a)."""
    t = e / param
    return jnp.where(t < 1e-8, 1.0, jnp.tanh(t) / jnp.maximum(t, 1e-300))


def fair_weight(e, param=1.3998):
    """CFairLoss (RobustLoss.h:345): w = 1/(1 + e/a)."""
    return 1.0 / (1.0 + e / param)


def welsch_weight(e, param=2.9846):
    """CWelschLoss (RobustLoss.h:393): w = exp(-(e/a)^2)."""
    return jnp.exp(-((e / param) ** 2))


LOSSES = {
    "huber": huber_weight,
    "cauchy": cauchy_weight,
    "tukey": tukey_weight,
    "hampel": hampel_weight,
    "logistic": logistic_weight,
    "fair": fair_weight,
    "welsch": welsch_weight,
}

# the reference's default error-norm scale: 16 * 1.4826 ~ 593/25
DEFAULT_SCALE = 593.0 / 25.0


def error_norm_weight_fn(loss: str = "huber", scale: float = DEFAULT_SCALE, **kw):
    """CRobustify_ErrorNorm_Default (RobustUtils.h:60-103): weight from the
    scaled error norm."""
    w = LOSSES[loss]

    def fn(r, sigma_inv):
        return w(jnp.linalg.norm(r) / scale, **kw)

    return fn


def chi2_weight_fn(loss: str = "huber", scale: float = 1.0, **kw):
    """CRobustify_Chi2_Default (RobustUtils.h:115-130): weight from the
    whitened (chi) error."""
    w = LOSSES[loss]

    def fn(r, sigma_inv):
        chi = jnp.sqrt(jnp.maximum(jnp.einsum("i,ij,j->", r, sigma_inv, r), 0.0))
        return w(chi / scale, **kw)

    return fn


def robustify(
    et: EdgeType,
    loss: str = "huber",
    scale: float = DEFAULT_SCALE,
    on_chi2: bool = False,
    name: str = None,
) -> EdgeType:
    """Register and return a robust variant of an edge type (the analog of
    the CBaseEdge::Robust option + f_RobustWeight)."""
    fn = (chi2_weight_fn if on_chi2 else error_norm_weight_fn)(loss, scale)
    return register_edge_type(
        dataclasses.replace(
            et,
            name=name or f"{et.name}_robust_{loss}",
            robust_weight_fn=fn,
        )
    )


def apply_robust_to_system(system, loss: str = "huber",
                           scale: float = DEFAULT_SCALE,
                           on_chi2: bool = False) -> None:
    """Swap every edge type in ``system`` for its robust variant in place —
    the runtime analog of instantiating the reference's edge types with the
    CRobustify_ErrorNorm_Default policy (RobustUtils.h:60; the reference
    selects robustness at compile time, we rebind the registry name)."""
    from slampp_tpu.graph.types import get_edge_type

    renames = {}
    for tname in list(system._edges.keys()):
        et = get_edge_type(tname)
        if et.robust_weight_fn is not None:
            continue
        new_name = f"{tname}_robust_{loss}"
        try:
            get_edge_type(new_name)
        except KeyError:
            robustify(et, loss=loss, scale=scale, on_chi2=on_chi2)
        renames[tname] = new_name
    for old, new in renames.items():
        system._edges[new] = system._edges.pop(old)
    system._dirty = True
