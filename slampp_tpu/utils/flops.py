"""FLOP accounting via XLA cost analysis.

Capability parity with the reference's ``sparse_flops`` instrumentation
(include/sparse_flops/Instrument.h:40 — exact FLOP counting by recompiling
CXSparse with a counting scalar type): here XLA's cost analysis reports the
flops of any jitted computation without touching the code under test.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` for the given args and return XLA's cost analysis
    (keys: 'flops', 'bytes accessed', 'transcendentals', ...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def flops(fn: Callable, *args, **kwargs) -> float:
    """Total floating-point operations of one invocation of ``fn``."""
    return float(cost_analysis(fn, *args, **kwargs).get("flops", float("nan")))
