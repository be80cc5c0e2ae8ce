"""renderih_tpu — a TPU-native two-hand 3D mesh-recovery framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of RenderIH
(ICCV 2023, adwardlee/RenderIH): given a single 256x256 RGB crop of two
interacting hands, regress full MANO meshes (778 verts + 21 joints per
hand) and an orthographic camera per hand — plus the surrounding
framework: data pipeline, SPMD trainer, evaluation suite, renderer, and
offline pose-optimization tooling.

Design notes (TPU-first, not a port):
  * All compute-path code is pure-functional JAX, jitted end to end.
  * Kinematics, skinning and graph convolutions are batched einsums that
    map onto the MXU; there are no per-joint Python loops in the hot path.
  * Multi-device scaling is SPMD over a `jax.sharding.Mesh` (data and
    optional model axes); gradient reduction and ZeRO-1 optimizer-state
    sharding are expressed as shardings, not hand-written collectives.
  * Hot kernels (fused token attention, SDF voxelization) have Pallas
    implementations in `renderih_tpu.kernels`.
"""

__version__ = "0.1.0"
