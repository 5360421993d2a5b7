"""orb_slam2_map_tpu — a TPU-native visual SLAM engine.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of
ORB_SLAM2_MAP (ORB-SLAM2 + dense point-cloud / octomap mapping): monocular,
stereo and RGB-D tracking; ORB feature extraction and Hamming matching as
batched device kernels; bundle adjustment / pose-graph optimization as JAX
Levenberg-Marquardt on the Schur complement; BoW place recognition as dense
vocabulary scoring; dense cloud + occupancy fusion on device; multi-host
scaling via jax.sharding meshes.

Design stance (see SURVEY.md §7): batch-everything, fixed shapes, SoA map
state, host orchestrator instead of the reference's thread/mutex graph.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/optimization matmuls need full f32: the TPU default truncates
# f32 matmul inputs to bf16 (8-bit mantissa), which costs ~1.5 cm ATE on
# the synthetic benchmark. Descriptor matching is unaffected — it casts
# to bf16 explicitly (exact for ±1 vectors with f32 accumulation).
_jax.config.update("jax_default_matmul_precision", "highest")
