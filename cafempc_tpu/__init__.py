"""cafempc_tpu — a TPU-native cascaded-fidelity MPC / trajectory-optimization
framework (JAX / XLA / Pallas / pjit).

Re-implements, TPU-first, the full capability surface of the CAFE-MPC
reference stack (multi-phase Hybrid-Systems DDP with AL/ReB constraint
handling, whole-body + SRB cascaded horizons, the HKD kinodynamic model,
reference management, and the MPC runtime), re-designed around:

  * flat, statically-shaped multi-phase knot plans (masked reset maps)
    instead of heterogeneous phase deques,
  * `vmap`-parallel multiple-shooting rollouts (every knot is a shooting
    state, so the forward sweep has no sequential dependence),
  * `lax.scan` (and associative-scan) Riccati backward sweeps,
  * scenario batching via `vmap` + `shard_map` over TPU meshes.

Reference (studied, not copied): ruihuang1124/CAFE-MPC @ /root/reference.
"""

__version__ = "0.1.0"
