"""Traced gate matrices: parameterized gates as functions of jax scalars.

Used by :meth:`StateVectorSimulator.run_parameterized` to compile a circuit
*structure* once and sweep its parameters without recompilation — the
variational-workload capability (VQE/QAOA parameter sweeps) the reference
could not express (its gates were baked into per-launch kernel arguments,
but every run re-dispatched from the host).

Matrices come back as (real, imag-or-None) planes; "diagonal" gates return
their (2^k,) diagonals. Conventions identical to :mod:`tpu_qsim.gates`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _c(theta):
    return jnp.cos(theta / 2)


def _s(theta):
    return jnp.sin(theta / 2)


def rx(theta, dtype):
    c, s = _c(theta).astype(dtype), _s(theta).astype(dtype)
    z = jnp.zeros((), dtype)
    ur = jnp.stack([jnp.stack([c, z]), jnp.stack([z, c])])
    ui = jnp.stack([jnp.stack([z, -s]), jnp.stack([-s, z])])
    return ur, ui


def ry(theta, dtype):
    c, s = _c(theta).astype(dtype), _s(theta).astype(dtype)
    ur = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return ur, None


def rz(theta, dtype):
    c, s = _c(theta).astype(dtype), _s(theta).astype(dtype)
    return jnp.stack([c, c]), jnp.stack([-s, s])          # diagonal


def p(lam, dtype):
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    return (jnp.stack([one, jnp.cos(lam).astype(dtype)]),
            jnp.stack([zero, jnp.sin(lam).astype(dtype)]))  # diagonal


def crz(theta, dtype):
    c, s = _c(theta).astype(dtype), _s(theta).astype(dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    return (jnp.stack([one, one, c, c]),
            jnp.stack([zero, zero, -s, s]))                # diagonal

def cp(lam, dtype):
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    return (jnp.stack([one, one, one, jnp.cos(lam).astype(dtype)]),
            jnp.stack([zero, zero, zero, jnp.sin(lam).astype(dtype)]))


def cry(theta, dtype):
    c, s = _c(theta).astype(dtype), _s(theta).astype(dtype)
    one = jnp.ones((), dtype)
    z = jnp.zeros((), dtype)
    ur = jnp.stack([
        jnp.stack([one, z, z, z]),
        jnp.stack([z, one, z, z]),
        jnp.stack([z, z, c, -s]),
        jnp.stack([z, z, s, c]),
    ])
    return ur, None


# name -> (builder, is_diagonal)
TRACED_GATES = {
    "rx": (rx, False),
    "ry": (ry, False),
    "rz": (rz, True),
    "p": (p, True),
    "crz": (crz, True),
    "cp": (cp, True),
    "cry": (cry, False),
}
