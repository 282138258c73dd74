"""Pytree helpers for host plan objects.

Plans mix device index arrays (which must be jit ARGUMENTS — closure-captured
they embed as constants, bloating the MLIR by megabytes and crushing compile
times) with host-only payloads (dicts, numpy arrays) and static ints.  The
helpers here register such classes with the arrays as leaves and everything
else as identity-hashed static aux.
"""

from __future__ import annotations


class Static:
    """Identity-hashed wrapper so host-only payloads can sit in pytree aux
    (jit caches by aux equality; identity semantics are right for long-lived
    plan objects)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return other is self
