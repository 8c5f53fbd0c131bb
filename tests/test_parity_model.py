"""Full-model parity: reference torch CvaMVSNet vs tandem_tpu flax CvaMVSNet.

The golden contract of the reference is dr_mvsnet_test's mean-abs-error < 1e-2
on depth and confidence (tandem/libdr/dr_mvsnet/src/dr_mvsnet.cpp:505-521). We
hold ourselves to a tighter bound with randomly initialised weights converted
torch -> flax.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference
from tandem_tpu.models.cva_mvsnet import CvaMVSNet
from tandem_tpu.models.torch_convert import convert_state_dict


def _random_inputs(rng, B=1, V=3, H=64, W=96):
    image = rng.rand(B, V, 3, H, W).astype(np.float32)
    # Small camera motion around identity; K for a 64x80 image.
    K = np.array([[70.0, 0, (W - 1) / 2], [0, 70.0, (H - 1) / 2], [0, 0, 1]],
                 np.float32)
    Ks = []
    for scale in (0.25, 0.5, 1.0):
        Ks_ = K.copy()
        Ks_[:2] *= scale
        Ks.append(np.broadcast_to(Ks_, (B, 3, 3)).copy())
    c2w = np.zeros((B, V, 4, 4), np.float32)
    for b in range(B):
        for v in range(V):
            angle = 0.03 * (v - 1)
            c, s = np.cos(angle), np.sin(angle)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t = np.array([0.12 * (v - 1), 0.02 * v, 0.03 * v], np.float32)
            c2w[b, v, :3, :3] = R
            c2w[b, v, :3, 3] = t
            c2w[b, v, 3, 3] = 1
    depth_min = np.full((B,), 0.5, np.float32)
    depth_max = np.full((B,), 6.0, np.float32)
    return image, Ks, c2w, depth_min, depth_max


@requires_reference
@pytest.mark.parametrize("view_aggregation", [False, True])
def test_model_parity(rng, view_aggregation):
    import torch
    from tests.torch_ref import import_reference_models, state_dict_numpy

    _, ref_cva = import_reference_models()

    torch.manual_seed(1234)
    ref_model = ref_cva.CvaMVSNet(
        depth_num=(48, 32, 8), depth_interval_ratio=(1.0, 0.5, 0.25),
        feature_net_base_channels=8, cost_volume_base_channels=(8, 8, 8),
        view_aggregation=view_aggregation)
    ref_model.eval()

    image, Ks, c2w, dmin, dmax = _random_inputs(rng)

    with torch.no_grad():
        ref_out = ref_model(
            image=torch.from_numpy(image),
            intrinsic_matrix=ref_cva.StageTensor(*[torch.from_numpy(k) for k in Ks]),
            cam_to_world=torch.from_numpy(c2w),
            depth_min=torch.from_numpy(dmin),
            depth_max=torch.from_numpy(dmax))

    model = CvaMVSNet(view_aggregation=view_aggregation)
    variables = convert_state_dict(state_dict_numpy(ref_model),
                                   view_aggregation=view_aggregation)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    out = model.apply(
        variables, jnp.asarray(image),
        tuple(jnp.asarray(k) for k in Ks), jnp.asarray(c2w),
        jnp.asarray(dmin), jnp.asarray(dmax), train=False)

    for i, stage in enumerate(("stage1", "stage2", "stage3")):
        ref_depth = ref_out[i].depth.numpy()
        ref_conf = ref_out[i].confidence.numpy()
        got_depth = np.asarray(getattr(out, stage).depth)
        got_conf = np.asarray(getattr(out, stage).confidence)
        mae_depth = np.abs(ref_depth - got_depth).mean()
        mae_conf = np.abs(ref_conf - got_conf).mean()
        assert mae_depth < 1e-3, f"{stage} depth MAE {mae_depth}"
        assert mae_conf < 1e-3, f"{stage} confidence MAE {mae_conf}"


@requires_reference
def test_model_parity_with_edge_filter():
    import torch
    from tests.torch_ref import import_reference_models, state_dict_numpy

    _, ref_cva = import_reference_models()
    torch.manual_seed(7)
    ref_model = ref_cva.CvaMVSNet(view_aggregation=True)
    ref_model.eval()

    # Local RNG: decouple from test execution order
    image, Ks, c2w, dmin, dmax = _random_inputs(np.random.RandomState(42))
    discard = np.full((1,), 10.0, np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            image=torch.from_numpy(image),
            intrinsic_matrix=ref_cva.StageTensor(*[torch.from_numpy(k) for k in Ks]),
            cam_to_world=torch.from_numpy(c2w),
            depth_min=torch.from_numpy(dmin),
            depth_max=torch.from_numpy(dmax),
            depth_filter_discard_percentage=torch.from_numpy(discard))

    model = CvaMVSNet(view_aggregation=True)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(state_dict_numpy(ref_model)))
    out = model.apply(
        variables, jnp.asarray(image),
        tuple(jnp.asarray(k) for k in Ks), jnp.asarray(c2w),
        jnp.asarray(dmin), jnp.asarray(dmax),
        depth_filter_discard_percentage=jnp.asarray(discard), train=False)

    for i, stage in enumerate(("stage1", "stage2", "stage3")):
        # Dense (unfiltered) outputs must match tightly.
        ref_dense = ref_out[i].depth_dense.numpy()
        got_dense = np.asarray(getattr(out, stage).depth_dense)
        assert np.abs(ref_dense - got_dense).mean() < 1e-3
        # Filtered outputs: pixels near the exact quantile threshold can flip
        # between implementations; require the discard decision to agree on
        # nearly all pixels.
        ref_depth = ref_out[i].depth.numpy()
        got_depth = np.asarray(getattr(out, stage).depth)
        agree = ((ref_depth == 0) == (got_depth == 0)).mean()
        assert agree > 0.98, f"{stage} discard-mask agreement {agree}"
        both = (ref_depth > 0) & (got_depth > 0)
        assert np.abs(ref_depth[both] - got_depth[both]).mean() < 1e-3


def test_runner_split_matches_monolithic_model():
    """MvsnetRunner runs the cascade and the edge filter as two chained
    jits (scheduling perf); outputs must equal the monolithic
    model.apply(..., depth_filter_discard_percentage=...) exactly."""
    import jax.numpy as jnp
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables

    H, W, V = 64, 96, 7
    rng = np.random.RandomState(0)
    model = CvaMVSNet(view_aggregation=True)
    variables = init_variables(model, H, W, V)
    runner = MvsnetRunner(model, variables, H, W, view_num=V)

    bgrs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(V)]
    poses = []
    for v in range(V):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.05 * v
        poses.append(T)
    K = np.array([[60.0, 0, (W - 1) / 2], [0, 60.0, (H - 1) / 2],
                  [0, 0, 1]], np.float32)

    runner.call_async(bgrs, poses, K, 0.5, 6.0, discard_percentage=10.0)
    res = runner.get_result()

    image, Ks, c2w = runner.pack_inputs(bgrs, poses, K)
    out = model.apply(
        variables, jnp.asarray(image.astype(np.float32) / 255.0),
        tuple(jnp.asarray(k) for k in Ks), jnp.asarray(c2w),
        jnp.full((1,), 0.5, jnp.float32), jnp.full((1,), 6.0, jnp.float32),
        depth_filter_discard_percentage=jnp.full((1,), 10.0, jnp.float32),
        train=False)
    # The raw (pre-filter) outputs must match exactly.
    np.testing.assert_allclose(res["depth_dense"],
                               np.asarray(out.stage3.depth_dense[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res["confidence_dense"],
                               np.asarray(out.stage3.confidence_dense[0]),
                               rtol=1e-5, atol=1e-5)
    # Filtered outputs: pixels whose edge value TIES the discard threshold
    # can flip between the two compilations (float reduction order); allow
    # a handful of mask flips, everything else must match.
    for key, ref in (("depth", out.stage3.depth[0]),
                     ("confidence", out.stage3.confidence[0])):
        a, b = res[key], np.asarray(ref)
        bad = np.abs(a - b) > 1e-5 + 1e-5 * np.abs(b)
        assert bad.mean() < 0.005, (key, bad.mean())
        # every mismatch is a mask flip: one side exactly zero
        assert np.all((a[bad] == 0) | (b[bad] == 0)), key


@pytest.mark.slow
def test_runner_staged_matches_monolithic():
    """The staged per-stage-jit runner (MvsnetRunner(staged=True)) must
    reproduce the monolithic runner's outputs. f32 on CPU: the programs
    differ only in jit boundaries, so depth agrees to float tolerance
    (cascade re-centering amplifies nothing at f32)."""
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables

    H, W, V = 64, 96, 7
    rng = np.random.RandomState(1)
    model = CvaMVSNet(view_aggregation=True)
    variables = init_variables(model, H, W, V)

    bgrs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(V)]
    poses = []
    for v in range(V):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.05 * v
        poses.append(T)
    K = np.array([[60.0, 0, (W - 1) / 2], [0, 60.0, (H - 1) / 2],
                  [0, 0, 1]], np.float32)

    results = []
    for staged in (False, True, "perview"):
        runner = MvsnetRunner(model, variables, H, W, view_num=V,
                              staged=staged)
        runner.call_async(bgrs, poses, K, 0.5, 6.0,
                          discard_percentage=10.0)
        results.append(runner.get_result())
    mono = results[0]
    for staged_res in results[1:]:
        np.testing.assert_allclose(staged_res["depth_dense"],
                                   mono["depth_dense"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(staged_res["confidence_dense"],
                                   mono["confidence_dense"],
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_runner_staged_variance_volume():
    """Same three-mode sweep WITHOUT view aggregation: covers the
    variance-volume branches of the staged/perview builders (warp_only +
    the sum/sq-sum finalize), which the gated flagship sweep never
    executes."""
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables

    H, W, V = 64, 96, 3
    rng = np.random.RandomState(2)
    model = CvaMVSNet(view_aggregation=False)
    variables = init_variables(model, H, W, V)

    bgrs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(V)]
    poses = []
    for v in range(V):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.05 * v
        poses.append(T)
    K = np.array([[60.0, 0, (W - 1) / 2], [0, 60.0, (H - 1) / 2],
                  [0, 0, 1]], np.float32)

    results = []
    for staged in ("mono", "staged", "perview"):
        runner = MvsnetRunner(model, variables, H, W, view_num=V,
                              staged=staged)
        runner.call_async(bgrs, poses, K, 0.5, 6.0,
                          discard_percentage=10.0)
        results.append(runner.get_result())
    mono = results[0]
    for staged_res in results[1:]:
        np.testing.assert_allclose(staged_res["depth_dense"],
                                   mono["depth_dense"], rtol=1e-4, atol=1e-4)


def test_runner_rejects_bad_mode():
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner

    with pytest.raises(ValueError, match="staged"):
        MvsnetRunner(CvaMVSNet(), {}, 64, 96, staged="bogus")
