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

import os as _os

if not _os.environ.get("TANDEM_NO_JIT_CACHE"):
    # Persistent compilation cache for every tandem entry point (CLIs,
    # benches, tests all share it): the 640x480 cascade costs minutes to
    # hours of XLA time per signature; cold-compiling it per process is
    # the single largest contributor to CLI wall time. Same default dir
    # as tests/conftest.py and utils/benchmarking.force_real_timing.
    import jax as _jax_cache

    _jax_cache.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("TANDEM_JIT_CACHE", "/tmp/tandem_tpu_jit_cache"))
    _jax_cache.config.update("jax_persistent_cache_min_compile_time_secs",
                             1.0)

if (_os.environ.get("TANDEM_PLATFORM") == "cpu"
        and "xla_cpu_max_isa" not in _os.environ.get("XLA_FLAGS", "")):
    # Pin the CPU compile target (AVX2) so persistent-cache AOT blobs are
    # portable across heterogeneous hosts (VERDICT r4 item 8). Must land in
    # the env before the first backend initialization.
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                                + " --xla_cpu_max_isa=AVX2").strip()

_prec = _os.environ.get("TANDEM_MATMUL_PRECISION", "highest")
if _prec != "default":
    # TPU MXU precision: XLA:TPU's DEFAULT matmul/conv precision is lossier
    # than a native bf16xbf16->f32 pass — measured on the trained 640x480
    # cascade, golden depth MAE 1.8e-1 at default vs 9e-3 at highest for the
    # SAME bf16 weights/activations (experiments/tpu_bf16_dtype_probe.py,
    # docs/PERF.md round 5). The BA/tracker einsums accumulate thousands of
    # residual terms and would silently degrade the same way. 'highest' with
    # bf16 inputs IS the native MXU mode (f32 accumulation), so the flagship
    # bf16 compute path keeps full MXU throughput; f32 einsums pay 6-pass
    # cost where they occur. Override with TANDEM_MATMUL_PRECISION=default
    # to benchmark the lossy mode. CPU is unaffected (f32 stays f32).
    import jax as _jax_prec

    _jax_prec.config.update("jax_default_matmul_precision", _prec)

if _os.environ.get("TANDEM_PLATFORM"):
    # Force the JAX platform for every tandem CLI/entry point. A plain
    # ``JAX_PLATFORMS=cpu`` env var is not enough on managed hosts whose
    # sitecustomize re-pins the accelerator platform at interpreter start;
    # the config update below is authoritative as long as it happens
    # before the first backend initialization (which importing this
    # package precedes in all CLIs).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TANDEM_PLATFORM"])
