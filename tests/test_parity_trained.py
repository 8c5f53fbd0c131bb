"""Parity against the reference's SHIPPED TRAINED weights.

The reference's central contract is the golden model test: re-run the
deployed model and assert mean-abs-error < 1e-2 vs the eager reference
outputs (dr_mvsnet.cpp:505-521, executed at every boot via FullSystem::initDr
FullSystem.cpp:285-288).  Here the deployed model is the flax CvaMVSNet with
weights recovered from tandem/exported/*/model.pt (models/frozen_extract.py)
and the goldens in exported/*/sample_inputs.npz were produced by the
reference's own eager torch model running those same weights — so a pass
means the TPU model IS the trained CVA-MVSNet, at deployment shape.
"""

import os
import pickle

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + virtual devices)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_TOL = 1e-2  # dr_mvsnet_test threshold


def _load_unit(name):
    out_dir = os.path.join(REPO, "exported", name)
    pack = os.path.join(out_dir, "sample_inputs.npz")
    wpath = os.path.join(out_dir, "model_variables.pkl")
    if not (os.path.exists(pack) and os.path.exists(wpath)):
        pytest.skip(f"trained unit {name} not built "
                    "(scripts/make_trained_export.py)")
    with open(wpath, "rb") as f:
        variables = pickle.load(f)
    return pack, variables


@pytest.mark.parametrize("name", ["tandem_512x320"])
def test_trained_golden_fast(name):
    """512x320 deployment shape, f32 — the quick gate."""
    from tandem_tpu.cli.tandem_export import verify_golden
    pack, variables = _load_unit(name)
    err = verify_golden(pack, variables)
    assert err < GOLDEN_TOL, f"trained-weight parity broken: MAE={err:.2e}"


@pytest.mark.slow
def test_trained_golden_full_res():
    """640x480 V=7 deployment shape, f32 (the flagship runtime model)."""
    from tandem_tpu.cli.tandem_export import verify_golden
    pack, variables = _load_unit("tandem")
    err = verify_golden(pack, variables)
    assert err < GOLDEN_TOL, f"trained-weight parity broken: MAE={err:.2e}"


@pytest.mark.slow
def test_trained_golden_bf16_delta():
    """bf16 runtime dtype vs the f32 reference goldens: documents the
    mixed-precision drift at deployment shape. The runtime boot check uses
    10x the f32 tolerance (cli/tandem_dataset.py); assert within that."""
    import jax
    import jax.numpy as jnp
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet

    pack_path, variables = _load_unit("tandem_512x320")
    pack = np.load(pack_path)
    from tandem_tpu.cli.tandem_export import load_model_config
    model = CvaMVSNet(**load_model_config(os.path.dirname(pack_path)),
                      dtype=jnp.bfloat16)

    @jax.jit
    def forward(variables, image, K1, K2, K3, c2w, dmin, dmax, disc):
        return model.apply(variables, image, (K1, K2, K3), c2w, dmin, dmax,
                           depth_filter_discard_percentage=disc, train=False)

    img = pack["image"].astype(np.float32) / 255.0
    out = forward(variables, jnp.asarray(img), jnp.asarray(pack["K1"]),
                  jnp.asarray(pack["K2"]), jnp.asarray(pack["K3"]),
                  jnp.asarray(pack["cam_to_world"]),
                  jnp.asarray(pack["depth_min"]),
                  jnp.asarray(pack["depth_max"]),
                  jnp.full((1,), float(pack["discard_percentage"])))
    s3 = out.stage3
    mae_d = float(np.abs(np.asarray(s3.depth, np.float32)
                         - pack["out.stage3.depth"]).mean())
    mae_c = float(np.abs(np.asarray(s3.confidence, np.float32)
                         - pack["out.stage3.confidence"]).mean())
    print(f"bf16 deltas: depth MAE={mae_d:.4f} confidence MAE={mae_c:.4f}")
    assert mae_d < 10 * GOLDEN_TOL
    assert mae_c < 10 * GOLDEN_TOL


@pytest.mark.slow
@conftest.requires_reference
def test_weight_recovery_consistency():
    """The two shipped exports (frozen 640x480, unfused 512x320) must decode
    to the same checkpoint; cross-validates the frozen-graph extractor."""
    from tandem_tpu.models.frozen_extract import (
        extract_frozen_state_dict, extract_reference_weights)
    ref = "/root/reference/tandem/exported"
    if not os.path.isdir(ref):
        pytest.skip("reference exports not mounted")
    sd640 = extract_frozen_state_dict(f"{ref}/tandem/model.pt")
    sd512 = extract_reference_weights(f"{ref}/tandem_512x320/model.pt")
    assert set(sd640) == set(sd512)
    eps = 1e-5
    for k in sd512:
        if not k.endswith(".conv.weight"):
            continue
        base = k[: -len(".conv.weight")]
        folded = (np.all(sd640[base + ".bn.running_mean"] == 0)
                  and np.all(sd640[base + ".bn.weight"] == 1))
        g, b = sd512[base + ".bn.weight"], sd512[base + ".bn.bias"]
        mu = sd512[base + ".bn.running_mean"]
        var = sd512[base + ".bn.running_var"]
        s = g / np.sqrt(var + eps)
        if folded:
            w_exp = sd512[k] * s.reshape((-1,) + (1,) * (sd512[k].ndim - 1))
            np.testing.assert_allclose(sd640[k], w_exp, atol=1e-5)
            np.testing.assert_allclose(sd640[base + ".bn.bias"], b - mu * s,
                                       atol=1e-5)
        else:
            np.testing.assert_allclose(sd640[k], sd512[k], atol=1e-6)
