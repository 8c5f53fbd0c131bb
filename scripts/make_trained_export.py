"""Build the trained deployable units from the reference's shipped exports.

Reads /root/reference/tandem/exported/*/model.pt (the only trained CVA-MVSNet
artifacts that exist), recovers the weights (models/frozen_extract.py),
converts them to flax variables, and generates cross-framework golden packs:
the pack's ``out.*`` tensors come from the REFERENCE's own eager model (the
reference code executed with the recovered weights, torch CPU f32), so
``verify_golden`` proves TPU-vs-reference parity — the dr_mvsnet_test
contract (dr_mvsnet.cpp:505-521) — at every runtime boot.

Outputs (committed to the repo):
  exported/tandem/{model_variables.pkl, sample_inputs.npz}          640x480
  exported/tandem_512x320/{model_variables.pkl, sample_inputs.npz}  512x320

Usage:  python scripts/make_trained_export.py
"""

import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from tandem_tpu.models.frozen_extract import extract_reference_weights  # noqa: E402
from tandem_tpu.models.torch_convert import convert_state_dict  # noqa: E402

REF = "/root/reference/tandem/exported"
# Both reference exports carry the same checkpoint (verified in
# frozen_extract); the unfused 512x320 archive is the canonical source.
WEIGHTS_SRC = f"{REF}/tandem_512x320/model.pt"
DISCARD = 10.0

# The deployed architecture is abl04 "fewer depth planes": DEPTH_NUM
# (48, 4, 4) — proven from the frozen graphs themselves: both shipped
# model.pt files contain 4x (1, 2, 2)-stride 3D convs, the CostRegNet
# has_four_depths branch that only exists for D == 4 (module.py:554-567;
# configs/abl04_fewer_depth_planes.yaml DEPTH_NUM (48, 4, 4)). The paper's
# 201 ms/KF GPU number (abl04_fewer_depth_planes.txt) is for THIS shape.
DEPTH_NUM = [48, 4, 4]
MODEL_CONFIG = {
    "depth_num": DEPTH_NUM,
    "depth_interval_ratio": [1.0, 0.5, 0.25],
    "feature_net_base_channels": 8,
    "cost_volume_base_channels": [8, 8, 8],
    "view_aggregation": True,
}


def make_inputs(H, W, V=7, seed=7):
    """Synthetic but geometrically valid 7-view window: smooth textures,
    a laterally translating camera, plausible depth range. Images are
    uint8-quantized — the runtime's own input domain (BGR uint8 / 255)."""
    g = np.random.RandomState(seed)
    base = torch.from_numpy(g.rand(V, 3, H // 8, W // 8).astype(np.float32))
    img = torch.nn.functional.interpolate(
        base, size=(H, W), mode="bilinear", align_corners=False)
    img_u8 = (img.numpy() * 255.0).round().astype(np.uint8)[None]  # (1,V,3,H,W)

    K3 = np.array([[0.78 * W, 0, (W - 1) / 2], [0, 0.78 * W, (H - 1) / 2],
                   [0, 0, 1]], np.float32)
    Ks = [K3 * np.array([[s], [s], [1]], np.float32) for s in (0.25, 0.5, 1.0)]
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.06 * v
        c2w[0, v, 1, 3] = 0.01 * ((-1) ** v)
    return {
        "image": img_u8,
        "K1": Ks[0][None], "K2": Ks[1][None], "K3": Ks[2][None],
        "cam_to_world": c2w,
        "depth_min": np.full((1,), 0.5, np.float32),
        "depth_max": np.full((1,), 8.0, np.float32),
    }


def torch_golden(eager, inputs):
    """Reference eager forward on the pack inputs → golden out.* arrays."""
    img = torch.from_numpy(inputs["image"].astype(np.float32) / 255.0)
    Ks = tuple(torch.from_numpy(inputs[k]) for k in ("K1", "K2", "K3"))
    with torch.no_grad():
        out = eager(image=img,
                    intrinsic_matrix=Ks,
                    cam_to_world=torch.from_numpy(inputs["cam_to_world"]),
                    depth_min=torch.from_numpy(inputs["depth_min"]),
                    depth_max=torch.from_numpy(inputs["depth_max"]),
                    depth_filter_discard_percentage=torch.tensor([DISCARD]))
    golden = {}
    for stage in ("stage1", "stage2", "stage3"):
        s = getattr(out, stage)
        golden[f"out.{stage}.depth"] = s.depth.numpy()
        golden[f"out.{stage}.confidence"] = s.confidence.numpy()
        golden[f"out.{stage}.depth_dense"] = s.depth_dense.numpy()
        golden[f"out.{stage}.confidence_dense"] = s.confidence_dense.numpy()
    return golden


def main():
    from torch_ref import import_reference_models

    sd = extract_reference_weights(WEIGHTS_SRC)
    variables = convert_state_dict(sd, view_aggregation=True)

    _, cva = import_reference_models()
    eager = cva.CvaMVSNet(depth_num=DEPTH_NUM,
                          depth_interval_ratio=[1.0, 0.5, 0.25],
                          feature_net_base_channels=8,
                          cost_volume_base_channels=[8, 8, 8],
                          view_aggregation=True)
    eager.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=False)
    eager.eval()

    from tandem_tpu.cli.tandem_export import verify_golden

    for name, (H, W) in (("tandem", (480, 640)),
                         ("tandem_512x320", (320, 512))):
        out_dir = os.path.join(REPO, "exported", name)
        os.makedirs(out_dir, exist_ok=True)
        inputs = make_inputs(H, W)
        pack = dict(inputs)
        pack["discard_percentage"] = np.float32(DISCARD)
        pack.update(torch_golden(eager, inputs))
        pack_path = os.path.join(out_dir, "sample_inputs.npz")
        np.savez_compressed(pack_path, **pack)
        with open(os.path.join(out_dir, "model_variables.pkl"), "wb") as f:
            pickle.dump(variables, f)
        import json
        with open(os.path.join(out_dir, "model_config.json"), "w") as f:
            json.dump(MODEL_CONFIG, f, indent=1)
        err = verify_golden(pack_path, jax.tree_util.tree_map(
            np.asarray, variables))
        print(f"{name} ({W}x{H}): TPU-vs-reference golden MAE = {err:.2e} "
              f"({'OK' if err < 1e-2 else 'FAIL'})")
        assert err < 1e-2

        # Self-contained StableHLO module (the model.pt analogue).
        from tandem_tpu.cli.tandem_export import (export_stablehlo,
                                                  verify_stablehlo)
        mk = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in MODEL_CONFIG.items()}

        class _A:
            height, width, view_num = H, W, 7
            view_aggregation = True
        if export_stablehlo(variables, _A,
                            os.path.join(out_dir, "model.stablehlo"),
                            model_kwargs=mk):
            serr = verify_stablehlo(out_dir)
            print(f"{name}: stablehlo golden replay MAE = {serr:.2e} "
                  f"({'OK' if serr < 1e-2 else 'FAIL'})")
            assert serr < 1e-2


if __name__ == "__main__":
    main()
