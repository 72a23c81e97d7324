"""Demo: ``python -m tpu_qsim``.

The analog of the reference's ``quantum_sim`` demo executable (reference
src/main.cpp:43-112): prints device properties, Bell-state amplitudes and
probabilities, 4-qubit GHZ probabilities, and a 1000-shot Bell sampling
histogram.
"""

from __future__ import annotations

import numpy as np


def fmt_basis(i: int, n: int) -> str:
    return "|" + format(i, f"0{n}b") + ">"


def main() -> int:
    import jax

    import tpu_qsim as q

    print("=" * 60)
    print("tpu_qsim demo")
    print("=" * 60)
    dev = jax.devices()[0]
    print(f"\nDevice: {dev.device_kind} ({dev.platform}), "
          f"{len(jax.devices())} device(s) visible")

    # Bell state
    print("\n-- Bell state: h(0).cnot(0,1) --")
    sim = q.StateVectorSimulator(2, seed=1234)
    sim.run(q.bell_circuit())
    state = sim.get_state()
    probs = sim.get_probabilities()
    for i in range(4):
        print(f"  {fmt_basis(i, 2)}  amp = {state[i]:+.4f}   "
              f"P = {probs[i]:.4f}")

    # GHZ-4
    print("\n-- GHZ-4 probabilities --")
    sim4 = q.StateVectorSimulator(4, seed=1)
    sim4.run(q.ghz_circuit(4))
    p4 = sim4.get_probabilities()
    for i in np.nonzero(p4 > 1e-6)[0]:
        print(f"  {fmt_basis(int(i), 4)}  P = {p4[i]:.4f}")

    # Bell sampling histogram
    print("\n-- 1000-shot Bell sampling --")
    hist = sim.histogram(1000)
    for idx, count in sorted(hist.items()):
        bar = "#" * (count // 20)
        print(f"  {fmt_basis(idx, 2)}  {count:4d}  {bar}")

    # Noisy trajectory
    print("\n-- Noisy GHZ-3 (depolarizing 1%, 500 trajectories) --")
    nm = q.NoiseModel().add_depolarizing(0.01)
    bs = q.BatchedSimulator(3, 500, nm, seed=7)
    bs.run(q.ghz_circuit(3))
    avg = bs.average_probabilities()
    for i in np.nonzero(avg > 5e-3)[0]:
        print(f"  {fmt_basis(int(i), 3)}  P = {avg[i]:.4f}")

    # Density matrix
    print("\n-- Exact density matrix: Bell + 5% phase damping --")
    dm = q.DensityMatrixSimulator(2, q.NoiseModel().add_phase_damping(0.05))
    dm.run(q.bell_circuit())
    print(f"  trace  = {dm.trace():.6f}")
    print(f"  purity = {dm.purity():.6f}")

    print("\ndone.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
