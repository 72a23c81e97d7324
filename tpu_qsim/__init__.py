"""tpu_qsim — a TPU-native quantum circuit simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference CUDA
state-vector simulator (rylanmalarchick/cuda-quantum-simulator): exact pure
state simulation, Monte-Carlo wavefunction noise, batched trajectories,
exact density-matrix simulation with Kraus channels, measurement/sampling —
designed TPU-first (one fused XLA program per circuit, MXU contractions,
Pallas VMEM-resident kernels, shard_map multi-chip scaling) rather than as a
kernel-for-kernel translation.
"""

from .circuit import (
    Circuit,
    Gate,
    bell_circuit,
    ghz_circuit,
    hardware_efficient_ansatz,
    qft_circuit,
    random_circuit,
)
from .config import DEFAULT_CONFIG, SimConfig
from .cpu_reference import CPUReferenceSimulator
from .statevector import StateVectorSimulator, build_expectation_fn

__all__ = [
    "Circuit",
    "Gate",
    "bell_circuit",
    "ghz_circuit",
    "qft_circuit",
    "hardware_efficient_ansatz",
    "random_circuit",
    "SimConfig",
    "DEFAULT_CONFIG",
    "CPUReferenceSimulator",
    "StateVectorSimulator",
    "build_expectation_fn",
    "simulate",
]


def simulate(circuit, shots: int | None = None, *, seed: int = 0, **config_kw):
    """One-call convenience: run ``circuit`` from |0...0> and return the
    final amplitudes, or a histogram when ``shots`` is given."""
    from .config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG.replace(**config_kw) if config_kw else DEFAULT_CONFIG
    sim = StateVectorSimulator(circuit.num_qubits, cfg, seed=seed)
    sim.run(circuit)
    if shots is None:
        return sim.get_state()
    return sim.histogram(shots)

__version__ = "0.1.0"


def __getattr__(name: str):
    # Lazy imports for the heavier stacks so `import tpu_qsim` stays cheap.
    if name in ("NoiseModel", "NoiseChannel", "NoiseType"):
        from . import noise

        return getattr(noise, name)
    if name in ("NoisySimulator", "BatchedSimulator"):
        from . import noisy

        return getattr(noisy, name)
    if name in ("DensityMatrixSimulator",):
        from . import density

        return getattr(density, name)
    if name in ("ShardedStateVectorSimulator", "ShardedBatchedSimulator"):
        from . import parallel

        return getattr(parallel, name)
    if name in (
        "grover_circuit",
        "qaoa_maxcut_circuit",
        "qaoa_maxcut_objective",
        "maxcut_expectation",
        "phase_estimation_circuit",
        "estimate_phase",
        "amplitude_estimation_circuit",
        "estimate_amplitude",
        "trotter_circuit",
        "classical_shadow",
        "shadow_expectation_pauli",
        "shadow_reduced_density_matrix",
        "tfim_hamiltonian",
        "heisenberg_hamiltonian",
        "vqe_minimize",
    ):
        from . import algorithms

        return getattr(algorithms, name)
    if name in ("from_qasm", "from_qasm_file", "to_qasm"):
        from . import qasm

        return getattr(qasm, name)
    if name in ("StabilizerSimulator", "CliffordCircuit"):
        from . import stabilizer

        return getattr(stabilizer, name)
    raise AttributeError(f"module 'tpu_qsim' has no attribute '{name}'")
