"""Batched-JAX adapters exposing the NumPy-kernel interface for any type.

The FastL resident-system engine (solvers/fastl.py) wants host-side batched
residual/Jacobian/retract kernels.  The SE(2) family has hand-written NumPy
mirrors (models/np_kernels.py); every OTHER registered type gets these
adapters: ONE cached, bucket-padded jitted call per batch on the host CPU
backend — exact parity with the batch solvers by construction (it IS the
same autodiff linearization, core/assembly.py), at the cost of one
~0.3-1 ms dispatch per relinearization batch instead of pure-NumPy speed.

This keeps the FastL engine's capability UNIVERSAL (SE(3) spheres, ROCV,
…) while the flagship SE(2) path stays dispatch-free; robust-weighted
edges remain excluded (IRLS reweighting belongs to the batch solvers).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.graph.types import get_edge_type, get_vertex_type


def _cpu_dev():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _bucket(n: int, gran: int = 64) -> int:
    b = gran
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=128)
def _edge_lin_jit(name: str):
    from slampp_tpu.core.assembly import _edge_residual_and_jacobians

    et = get_edge_type(name)
    vts = tuple(get_vertex_type(t) for t in et.vertex_types)

    def one(*args):
        return _edge_residual_and_jacobians(et, vts, args[:-1], args[-1])

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=64)
def _retract_jit(tname: str):
    vt = get_vertex_type(tname)
    return jax.jit(jax.vmap(vt.retract))


@functools.lru_cache(maxsize=64)
def _local_diff_jit(tname: str):
    vt = get_vertex_type(tname)
    if vt.local_diff is not None:
        return jax.jit(jax.vmap(vt.local_diff))
    d = vt.dim

    def diff(cur, ref):
        return (cur - ref)[:d]

    return jax.jit(jax.vmap(diff))


def make_edge_lin(name: str):
    """NP_EDGE_LIN-compatible callable backed by the jitted autodiff
    linearization (bucket-padded batch, pinned to the host CPU device)."""
    et = get_edge_type(name)
    fn = _edge_lin_jit(name)
    dev = _cpu_dev()

    def call(slot_states, meas):
        E = meas.shape[0]
        B = _bucket(max(E, 1))
        padded = tuple(
            np.concatenate(
                [s, np.repeat(s[-1:], B - E, 0)] if E else
                [np.zeros((B,) + s.shape[1:])]
            )
            for s in slot_states
        )
        mp = np.concatenate([meas, np.repeat(meas[-1:], B - E, 0)]) if E else (
            np.zeros((B,) + meas.shape[1:])
        )
        args = tuple(jnp.asarray(s) for s in padded) + (jnp.asarray(mp),)
        if dev is not None:
            with jax.default_device(dev):
                r, jacs = fn(*args)
        else:
            r, jacs = fn(*args)
        return np.asarray(r)[:E], tuple(np.asarray(j)[:E] for j in jacs)

    call.arity = et.arity
    return call


def make_retract(tname: str):
    fn = _retract_jit(tname)
    dev = _cpu_dev()

    def call(states, delta):
        B = _bucket(max(states.shape[0], 1))
        n = states.shape[0]
        sp = np.concatenate([states, np.zeros((B - n,) + states.shape[1:])])
        dp = np.concatenate([delta, np.zeros((B - n,) + delta.shape[1:])])
        if dev is not None:
            with jax.default_device(dev):
                out = fn(jnp.asarray(sp), jnp.asarray(dp))
        else:
            out = fn(jnp.asarray(sp), jnp.asarray(dp))
        return np.asarray(out)[:n]

    return call


def make_local_diff(tname: str):
    fn = _local_diff_jit(tname)
    dev = _cpu_dev()

    def call(cur, ref):
        n = cur.shape[0]
        B = _bucket(max(n, 1))
        cp = np.concatenate([cur, np.repeat(cur[-1:], B - n, 0)] if n else
                            [np.zeros((B,) + cur.shape[1:])])
        rp = np.concatenate([ref, np.repeat(ref[-1:], B - n, 0)] if n else
                            [np.zeros((B,) + ref.shape[1:])])
        if dev is not None:
            with jax.default_device(dev):
                out = fn(jnp.asarray(cp), jnp.asarray(rp))
        else:
            out = fn(jnp.asarray(cp), jnp.asarray(rp))
        return np.asarray(out)[:n]

    return call
