"""View-sharded multi-chip inference (parallel/view_shard.py) parity.

Runs on the 8-virtual-CPU-device mesh provisioned by conftest.py: the
sharded program's collectives (masked-psum ref broadcast + per-stage
volume psum) must reproduce the single-device cascade exactly (f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tandem_tpu.models.cva_mvsnet import CvaMVSNet
from tandem_tpu.parallel import build_view_sharded_forward
from tandem_tpu.pipeline.mvsnet_runner import init_variables


def _inputs(H, W, V, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(1, V, 3, H, W).astype(np.float32)
    K3 = np.array([[60.0, 0, (W - 1) / 2], [0, 60.0, (H - 1) / 2],
                   [0, 0, 1]], np.float32)
    Ks = []
    for s in (0.25, 0.5, 1.0):
        K = K3.copy()
        K[:2] *= s
        Ks.append(jnp.asarray(K[None]))
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.05 * v
        c2w[0, v, 1, 3] = 0.01 * v
    return (jnp.asarray(image), tuple(Ks), jnp.asarray(c2w),
            jnp.full((1,), 0.5, jnp.float32), jnp.full((1,), 6.0,
                                                       jnp.float32))


@pytest.mark.parametrize("view_agg,n_shards,V", [(True, 4, 7),
                                                 (False, 2, 5)])
def test_view_sharded_matches_monolithic(view_agg, n_shards, V):
    H, W = 64, 96
    model = CvaMVSNet(view_aggregation=view_agg)
    variables = init_variables(model, H, W, V)
    image, Ks, c2w, dmin, dmax = _inputs(H, W, V)

    out = model.apply(variables, image, Ks, c2w, dmin, dmax, train=False)
    ref_d = np.asarray(out.stage3.depth)
    ref_c = np.asarray(out.stage3.confidence)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), axis_names=("view",))
    fn = build_view_sharded_forward(model, mesh)
    d, c = fn(variables, image, Ks, c2w, dmin, dmax)

    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), ref_c, rtol=1e-3, atol=1e-3)


def test_mesh_runner_matches_single_device():
    """MvsnetRunner(mesh=...) serves the view-sharded cascade under the
    same CallAsync/GetResult protocol and must match the single-device
    runner bit-for-bit at f32 tolerance."""
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner

    H, W, V = 64, 96, 5
    rng = np.random.RandomState(3)
    model = CvaMVSNet(view_aggregation=True)
    variables = init_variables(model, H, W, V)
    bgrs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(V)]
    poses = []
    for v in range(V):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.04 * v
        poses.append(T)
    K = np.array([[60.0, 0, (W - 1) / 2], [0, 60.0, (H - 1) / 2],
                  [0, 0, 1]], np.float32)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("view",))
    results = []
    for kw in ({}, {"mesh": mesh}):
        runner = MvsnetRunner(model, variables, H, W, view_num=V, **kw)
        runner.call_async(bgrs, poses, K, 0.5, 6.0,
                          discard_percentage=10.0)
        results.append(runner.get_result())
    np.testing.assert_allclose(results[1]["depth_dense"],
                               results[0]["depth_dense"],
                               rtol=1e-4, atol=1e-4)
