"""covins_tpu — a TPU-native collaborative visual-inertial SLAM back-end.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
VIS4ROB-lab/covins (COVINS + COVINS-G): multi-agent keyframe ingest, batched
place recognition over an HBM-resident descriptor database, loop closure via
vmapped robust estimation, map merge, pose-graph optimization and global
visual-inertial bundle adjustment with Schur-complement landmark elimination,
sharded over TPU device meshes.
"""

__version__ = "0.1.0"
