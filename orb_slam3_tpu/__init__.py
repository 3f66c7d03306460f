"""orb_slam3_tpu — a TPU-native visual-inertial multi-map SLAM engine.

Brand-new JAX/XLA/Pallas implementation of the capability set of ORB-SLAM3
(reference: UZ-SLAMLab/ORB_SLAM3, mounted at /root/reference — studied for
behavior, not ported):

- monocular / stereo / RGB-D tracking, pinhole + fisheye camera models
- ORB feature pipeline (pyramid FAST + rBRIEF) as batched XLA/Pallas kernels
- IMU preintegration as fused scans, 3-stage inertial initialization
- a single batched Levenberg-Marquardt engine with Schur-complement landmark
  elimination serving every optimizer entry point of the reference
  (motion-only BA, local BA, visual-inertial BA, inertial-only MAP,
  Sim3, essential-graph, global BA)
- bag-of-words place recognition as batched Hamming matmuls
- Atlas multi-map state as fixed-capacity struct-of-arrays tensors,
  shardable over a device mesh for distributed bundle adjustment.

Design stance (SURVEY.md §7.1): no pointer graphs, no mutexes — padded
tensors with validity masks, pure jitted stage functions, and an explicit
host orchestrator.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/optimization correctness requires true f32 matmuls: the TPU MXU's
# default bf16 passthrough puts ~1e-3 relative error into 3x3 rotation
# algebra and normal-equation assembly, which is fatal for ATE parity with
# the (double-precision) reference. Kernels that can tolerate bf16 (descriptor
# scoring, image filtering) opt in explicitly with
# jax.default_matmul_precision / preferred_element_type.
_jax.config.update("jax_default_matmul_precision", "float32")
