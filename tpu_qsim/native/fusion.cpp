// Native circuit planner: gate-fusion grouping + schedule depth.
//
// C++ implementation of the same planning algorithm as tpu_qsim/fusion.py
// (greedy group packing with disjoint-support commutation) — the TPU-native
// counterpart of the reference's native graph-building tier (its Circuit/
// scheduling logic lived in C++, reference src/Circuit.cpp). Planning is
// pure host work on the gate list, so it lives in native code; the compute
// path stays in XLA/Pallas.
//
// Exposed as a C ABI consumed via ctypes (tpu_qsim/native/__init__.py).
// Results are bit-identical to the Python planner and differentially tested
// (tests/test_native.py).

#include <cstdint>
#include <vector>

namespace {

struct OpenGroup {
    uint64_t qubit_mask = 0;
    int size = 0;
};

inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

}  // namespace

extern "C" {

// Assign each gate a fusion-group id.
//
//   num_qubits      total qubits in the circuit
//   num_gates       number of gates
//   gate_qubits     flattened qubit indices
//   gate_offsets    size num_gates+1; gate g's qubits are
//                   gate_qubits[gate_offsets[g] .. gate_offsets[g+1])
//   max_fused       max qubits per fused group
//   group_ids_out   size num_gates; receives the group id per gate
//
// Returns the number of groups (or -1 on invalid input).
//
// Invariant (same as the Python planner): a gate joins the *latest* group
// touching any of its qubits when the union fits, else the first later group
// with room, else a new group. Group ids are emission-ordered.
int qsim_plan_groups(int num_qubits, int num_gates,
                     const int32_t* gate_qubits, const int32_t* gate_offsets,
                     int max_fused, int32_t* group_ids_out) {
    if (num_qubits < 1 || num_qubits > 63 || num_gates < 0 || max_fused < 1)
        return -1;

    std::vector<OpenGroup> groups;
    groups.reserve(num_gates);
    std::vector<int> last_touch(num_qubits, -1);

    for (int g = 0; g < num_gates; ++g) {
        uint64_t mask = 0;
        int dep = -1;
        for (int i = gate_offsets[g]; i < gate_offsets[g + 1]; ++i) {
            int q = gate_qubits[i];
            if (q < 0 || q >= num_qubits) return -1;
            mask |= (1ULL << q);
            if (last_touch[q] > dep) dep = last_touch[q];
        }

        int placed = -1;
        if (dep >= 0 &&
            popcount64(groups[dep].qubit_mask | mask) <= max_fused) {
            placed = dep;
        } else {
            int start = dep + 1 > 0 ? dep + 1 : 0;
            for (int c = start; c < static_cast<int>(groups.size()); ++c) {
                if (popcount64(groups[c].qubit_mask | mask) <= max_fused) {
                    placed = c;
                    break;
                }
            }
            if (placed < 0) {
                groups.push_back(OpenGroup{});
                placed = static_cast<int>(groups.size()) - 1;
            }
        }
        groups[placed].qubit_mask |= mask;
        groups[placed].size += 1;
        group_ids_out[g] = placed;
        for (int i = gate_offsets[g]; i < gate_offsets[g + 1]; ++i) {
            int q = gate_qubits[i];
            if (placed > last_touch[q]) last_touch[q] = placed;
        }
    }
    return static_cast<int>(groups.size());
}

// Schedule depth: greedy per-qubit leveling (same semantics as the Python
// Circuit.depth, mirroring the reference's getDepth algorithm).
int qsim_circuit_depth(int num_qubits, int num_gates,
                       const int32_t* gate_qubits, const int32_t* gate_offsets) {
    if (num_qubits < 1 || num_gates < 0) return -1;
    std::vector<int> level(num_qubits, 0);
    int depth = 0;
    for (int g = 0; g < num_gates; ++g) {
        int m = 0;
        for (int i = gate_offsets[g]; i < gate_offsets[g + 1]; ++i) {
            int q = gate_qubits[i];
            if (q < 0 || q >= num_qubits) return -1;
            if (level[q] > m) m = level[q];
        }
        ++m;
        for (int i = gate_offsets[g]; i < gate_offsets[g + 1]; ++i)
            level[gate_qubits[i]] = m;
        if (m > depth) depth = m;
    }
    return depth;
}

// Histogram of int32 sample values into `num_bins` counts (host-side
// post-processing of device sample output; the analog of the reference's
// host histogram loop, but O(n) single pass).
void qsim_histogram(const int32_t* samples, int64_t num_samples,
                    int64_t num_bins, int64_t* counts_out) {
    for (int64_t b = 0; b < num_bins; ++b) counts_out[b] = 0;
    for (int64_t i = 0; i < num_samples; ++i) {
        int32_t v = samples[i];
        if (v >= 0 && v < num_bins) ++counts_out[v];
    }
}

}  // extern "C"
