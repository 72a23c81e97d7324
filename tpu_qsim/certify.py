"""De-correlated large-n certification (round-4 VERDICT item 4).

The inverse round-trip (run U then U-dagger, check |0...0> comes back)
certifies through the SAME engine twice, so a systematic, adjoint-consistent
emission bug cancels: e.g. an emission that conjugates every gate matrix
(U -> U*) maps a real initial state to conj(U psi), and the (equally
conjugated) inverse returns conj(U-dagger U psi) = psi exactly — the
round-trip passes while every complex amplitude is wrong. Two independent
checks close that hole (proven by fault injection in
tests/test_certify.py):

* :func:`cross_engine_max_diff` — the same circuit through the Pallas grid
  engine AND the Pallas-free XLA fusion engine (completely disjoint
  compute paths: Mosaic kernel emission vs plain XLA einsum contractions),
  compared full-state on device, one scalar read back.
* :func:`qft_analytic_max_diff` — QFT of a computational basis state has
  the closed form amp_j = exp(2 pi i j k / 2^n) / sqrt(2^n); sampled
  amplitudes are checked against the formula — engine vs mathematics, no
  second simulator in the loop.

Reference anchor: tests/test_gpu_cpu_equivalence.cu's independent-oracle
principle (SURVEY §4.5), extended to sizes where the complex128 oracle is
infeasible (>= 28q states are 4-8 GB).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from . import apply as ap
from .circuit import Circuit, qft_circuit

__all__ = ["cross_engine_max_diff", "qft_analytic_max_diff", "diag_layer_analytic_max_diff", "permutation_analytic_max_dev"]


def cross_engine_max_diff(
    circuit: Circuit,
    *,
    interpret: bool = False,
    grid_params=None,
) -> float:
    """Max |plane difference| between the grid engine and the XLA engine.

    Runs ``circuit`` from |0...0> through the active-bit grid-sweep engine
    (Pallas/Mosaic) and through the fusion+einsum XLA engine (no Pallas
    anywhere), and returns the on-device max absolute difference over both
    f32 planes (a bound within sqrt(2) of the max amplitude error). At 28q
    this holds two 2.1 GB states plus transients — comfortably inside HBM —
    and reads back a single scalar.
    """
    from .fusion import fuse_circuit
    from .kernels.gridsweeps import build_grid_sweep_run
    from .statevector import build_xla_run_fn

    grid = build_grid_sweep_run(
        circuit, np.float32, interpret=interpret, params=grid_params
    )
    xla = build_xla_run_fn(fuse_circuit(circuit, 5), np.float32, False)
    x = ap.initial_state(circuit.num_qubits, np.float32)
    a = grid.run(x)
    b = xla(x)
    return float(jax.jit(lambda p, q: jnp.max(jnp.abs(p - q)))(a, b))


def _qft_reference_amps(n: int, k: int, idx: np.ndarray) -> np.ndarray:
    """Closed-form QFT amplitudes at flat indices ``idx`` for input |k>.

    :func:`tpu_qsim.circuit.qft_circuit` includes the final bit-reversal
    swaps, so it realizes the standard DFT matrix in the library's
    qubit-q-is-bit-q basis: amp_j = exp(2 pi i j k / 2^n) / sqrt(2^n)
    (verified against the complex128 oracle in tests/test_certify.py)."""
    phase = 2.0 * math.pi * (idx.astype(np.float64) * float(k)) / float(1 << n)
    return np.exp(1j * phase) / math.sqrt(1 << n)


def qft_analytic_max_diff(
    n: int,
    k: int | None = None,
    *,
    num_samples: int = 4096,
    run_fn=None,
    interpret: bool = False,
    grid_params=None,
) -> float:
    """Max |amplitude - closed form| over a deterministic sample of the
    QFT-of-|k> state, computed by the given engine.

    ``run_fn``: a planes-state -> planes-state executor; defaults to the
    grid engine compiled for :func:`qft_circuit`. The sample indices are an
    evenly spaced deterministic grid (covering every high-bit region, where
    sign/phase errors on high-bit emission paths would land).
    """
    if k is None:
        k = (0b1011 * ((1 << n) // 16 + 1)) % (1 << n)  # spread-bit input
    circuit = qft_circuit(n)
    if run_fn is None:
        from .kernels.gridsweeps import build_grid_sweep_run

        run_fn = build_grid_sweep_run(
            circuit, np.float32, interpret=interpret, params=grid_params
        ).run
    x = ap.initial_state(n, np.float32, index=k)
    y = run_fn(x)
    step = max(1, (1 << n) // num_samples)
    idx = np.arange(0, 1 << n, step, dtype=np.int64)
    take = jax.jit(lambda s: (s[0, idx], s[1, idx]))
    gr, gi = take(y)
    got = np.asarray(gr).astype(np.float64) + 1j * np.asarray(gi)
    want = _qft_reference_amps(n, k, idx)
    return float(np.max(np.abs(got - want)))


def diag_layer_analytic_max_diff(
    n: int,
    *,
    seed: int = 11,
    num_gates: int = 24,
    num_samples: int = 4096,
    run_fn=None,
    interpret: bool = False,
    grid_params=None,
) -> float:
    """Max |amplitude - closed form| for an H-layer + random-diagonal
    circuit, at a deterministic sample of flat indices.

    The circuit is H on every qubit followed by ``num_gates`` random
    diagonal gates (rz / cp / cz / t), so the exact state has
    amp_j = (1/sqrt(2^n)) * prod_g diag(U_g)[j restricted to g.qubits] —
    evaluated host-side in complex128 straight from the gate tables
    (library convention: qubits[0] = matrix-index MSB, see
    CPUReferenceSimulator.apply_matrix), with NO simulator in the loop.
    Catches phase/sign emission bugs — including the adjoint-consistent
    conjugation class the inverse round-trip is blind to
    (tests/test_certify.py) — at sizes where the complex128 oracle is
    infeasible, and costs only ~n + num_gates gates of engine compile
    (a full QFT at 28q would be ~420).
    """
    from .gates import op_matrix

    rng = np.random.default_rng(seed)
    c = Circuit(n)
    for qb in range(n):
        c.h(qb)
    for _ in range(num_gates):
        kind = int(rng.integers(0, 4))
        if kind == 0:
            c.rz(int(rng.integers(0, n)), float(rng.uniform(0, 2 * math.pi)))
        elif kind == 1:
            a_, b_ = (int(v) for v in rng.choice(n, size=2, replace=False))
            c.cp(a_, b_, float(rng.uniform(0, 2 * math.pi)))
        elif kind == 2:
            a_, b_ = (int(v) for v in rng.choice(n, size=2, replace=False))
            c.cz(a_, b_)
        else:
            c.t(int(rng.integers(0, n)))
    if run_fn is None:
        from .kernels.gridsweeps import build_grid_sweep_run

        run_fn = build_grid_sweep_run(
            c, np.float32, interpret=interpret, params=grid_params
        ).run

    x = ap.initial_state(n, np.float32)
    y = run_fn(x)
    step = max(1, (1 << n) // num_samples)
    idx = np.arange(0, 1 << n, step, dtype=np.int64)
    take = jax.jit(lambda s: (s[0, idx], s[1, idx]))
    gr, gi = take(y)
    del y
    got = np.asarray(gr).astype(np.float64) + 1j * np.asarray(gi)

    want = np.full(idx.shape, 1.0 / math.sqrt(1 << n), dtype=np.complex128)
    for g in list(c)[n:]:
        d = np.diagonal(op_matrix(g))
        k = len(g.qubits)
        sub = np.zeros(idx.shape, dtype=np.int64)
        for pos, qb in enumerate(g.qubits):
            sub |= ((idx >> qb) & 1) << (k - 1 - pos)
        want = want * d[sub]
    return float(np.max(np.abs(got - want)))


def permutation_analytic_max_dev(
    n: int,
    *,
    seed: int = 12,
    num_gates: int = 32,
    run_fn=None,
    interpret: bool = False,
    grid_params=None,
) -> float:
    """Run a random X/CNOT/SWAP program from |0...0> and check the full
    state equals the basis vector a host-side bit trace predicts.

    Permutation circuits keep the state a single basis vector, so the
    engine's amplitude-MOVEMENT machinery (pair addressing, lane rolls,
    row-block flips, sweep staging across high bits) is exercised at full
    width against a closed-form answer: amp[k*] = 1, everything else 0.
    Complements :func:`diag_layer_analytic_max_diff` (phases) — together
    the two cover the H/X/CNOT/Rz benchmark gate classes. Returns
    max(|amp[k*] - 1|, max |amp| elsewhere), computed on device with a
    fused where-iota reduction (no full-state copy; 29-30q states are
    donated-in-place scale).
    """
    rng = np.random.default_rng(seed)
    c = Circuit(n)
    bits = 0
    for _ in range(num_gates):
        kind = int(rng.integers(0, 3))
        if kind == 0:
            qb = int(rng.integers(0, n))
            c.x(qb)
            bits ^= 1 << qb
        elif kind == 1:
            a_, b_ = (int(v) for v in rng.choice(n, size=2, replace=False))
            c.cnot(a_, b_)
            if (bits >> a_) & 1:
                bits ^= 1 << b_
        else:
            a_, b_ = (int(v) for v in rng.choice(n, size=2, replace=False))
            c.swap(a_, b_)
            if ((bits >> a_) & 1) != ((bits >> b_) & 1):
                bits ^= (1 << a_) | (1 << b_)
    if run_fn is None:
        from .kernels.gridsweeps import build_grid_sweep_run

        run_fn = build_grid_sweep_run(
            c, np.float32, interpret=interpret, params=grid_params
        ).run

    x = ap.initial_state(n, np.float32)
    y = run_fn(x)

    def summarize(s):
        pos = jax.lax.broadcasted_iota(jnp.int64, s.shape, 1)
        rest = jnp.max(jnp.where(pos == bits, 0.0, jnp.abs(s)))
        return s[0, bits], s[1, bits], rest

    ar, ai, rest = (float(v) for v in jax.jit(summarize)(y))
    return max(abs(complex(ar, ai) - 1.0), rest)
