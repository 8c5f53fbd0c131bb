"""tandem-tpu: a TPU-native real-time monocular dense SLAM framework.

Re-implements the capabilities of tum-vision/tandem (DSO-style photometric VO +
CVA-MVSNet cascaded multi-view stereo + TSDF fusion with raycast feedback) as an
idiomatic JAX/XLA/Pallas stack:

- ``tandem_tpu.models``   CVA-MVSNet as pure flax modules (NHWC/NDHWC layouts).
- ``tandem_tpu.ops``      plane-sweep warp, grid sampling, fused kernels.
- ``tandem_tpu.mapping``  dense block-grid TSDF fusion, raycast, marching cubes.
- ``tandem_tpu.tracking`` coarse photometric tracker + windowed bundle adjustment.
- ``tandem_tpu.pipeline`` the host-side frame loop with one-keyframe lookahead.
- ``tandem_tpu.train``    data-parallel trainer over a jax.sharding.Mesh.

The reference implementation lives at tum-vision/tandem (CUDA/libtorch); file:line
citations in docstrings point there for behavioural parity checks.
"""

__version__ = "0.1.0"
