"""Export CLI — the reference export_model.py equivalent.

The reference traces the torch model to TorchScript and saves golden
inputs+outputs (export_model.py:80-227, consumed by dr_mvsnet_test). The TPU
deployable unit is: orbax weights + a golden pack (inputs AND outputs) saved
as NPZ + depth/confidence PNGs. ``verify_golden`` replays the pack through
the compiled runner and checks mean-abs-error < 1e-2 — the same contract as
dr_mvsnet.cpp:505-521; the runtime runs it at boot (FullSystem initDr
self-check equivalent).

Usage:
  python -m tandem_tpu.cli.tandem_export --ckpt CKPT --data-root DIR \
      --out-dir exported/tandem [--width 640 --height 480]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True)
parser.add_argument("--data-root", default=None,
                    help="Replica root; if absent, a synthetic window is used")
parser.add_argument("--out-dir", required=True)
parser.add_argument("--width", type=int, default=640)
parser.add_argument("--height", type=int, default=480)
parser.add_argument("--view-num", type=int, default=7)
parser.add_argument("--discard-percentage", type=float, default=10.0)
parser.add_argument("--view-aggregation", action="store_true", default=True)
parser.add_argument("--depth-num", default="48,32,8",
                    help="per-stage depth planes; the SHIPPED reference "
                         "model is 48,4,4 (abl04)")

GOLDEN_TOL = 1e-2  # dr_mvsnet_test threshold (dr_mvsnet.cpp:505-521)


def load_model_config(unit_dir: str) -> dict:
    """CvaMVSNet constructor kwargs for a deployable unit.

    The reference's model.pt is self-describing (the traced graph IS the
    architecture); the TPU unit carries a model_config.json instead. Units
    without one (older exports) get the training defaults."""
    import json
    path = os.path.join(unit_dir, "model_config.json")
    if os.path.exists(path):
        with open(path) as f:
            cfg = json.load(f)
        return {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in cfg.items()}
    return {"view_aggregation": True}


def _model_kwargs_from_args(args) -> dict:
    return {
        "depth_num": tuple(int(x) for x in
                           str(args.depth_num).split(",")),
        "view_aggregation": args.view_aggregation,
    }


def build_inputs(args):
    if args.data_root:
        from ..data.replica import MVSDataset, collate
        ds = MVSDataset(args.data_root, "val", height=args.height,
                        width=args.width)
        batch = collate([ds[0]])
        return {
            "image": batch["image"].astype(np.float32),
            "K1": batch["intrinsics"]["stage1"]["K"][:, 0],
            "K2": batch["intrinsics"]["stage2"]["K"][:, 0],
            "K3": batch["intrinsics"]["stage3"]["K"][:, 0],
            "cam_to_world": batch["cam_to_world"],
            "depth_min": batch["depth_min"],
            "depth_max": batch["depth_max"],
        }
    rng = np.random.RandomState(0)
    H, W, V = args.height, args.width, args.view_num
    K3 = np.array([[0.6 * W, 0, (W - 1) / 2], [0, 0.6 * W, (H - 1) / 2],
                   [0, 0, 1]], np.float32)
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.05 * v
    return {
        "image": rng.rand(1, V, 3, H, W).astype(np.float32),
        "K1": (K3 * np.array([[0.25], [0.25], [1]], np.float32))[None],
        "K2": (K3 * np.array([[0.5], [0.5], [1]], np.float32))[None],
        "K3": K3[None],
        "cam_to_world": c2w,
        "depth_min": np.full((1,), 0.5, np.float32),
        "depth_max": np.full((1,), 6.0, np.float32),
    }


def run_model(variables, inputs, args, model_kwargs=None):
    import jax
    import jax.numpy as jnp

    from ..models.cva_mvsnet import CvaMVSNet

    model = CvaMVSNet(**(model_kwargs
                         if model_kwargs is not None
                         else _model_kwargs_from_args(args)))

    @jax.jit
    def forward(variables, image, K1, K2, K3, c2w, dmin, dmax, disc):
        return model.apply(variables, image, (K1, K2, K3), c2w, dmin, dmax,
                           depth_filter_discard_percentage=disc, train=False)

    disc = np.full((1,), args.discard_percentage, np.float32)
    out = forward(variables, *(jnp.asarray(inputs[k]) for k in
                               ("image", "K1", "K2", "K3", "cam_to_world",
                                "depth_min", "depth_max")),
                  jnp.asarray(disc))
    outputs = {}
    for stage in ("stage1", "stage2", "stage3"):
        s = getattr(out, stage)
        outputs[f"{stage}.depth"] = np.asarray(s.depth)
        outputs[f"{stage}.confidence"] = np.asarray(s.confidence)
        outputs[f"{stage}.depth_dense"] = np.asarray(s.depth_dense)
        outputs[f"{stage}.confidence_dense"] = np.asarray(s.confidence_dense)
    return outputs


def verify_golden(pack_path: str, variables, args=None) -> float:
    """Replay the golden pack; return worst mean-abs-error. Boot-time
    self-check (test_dr_mvsnet equivalent). The model architecture comes
    from the unit's model_config.json when present (self-describing unit,
    like the reference's traced model.pt)."""
    pack = np.load(pack_path)
    class _A:  # minimal args shim
        view_aggregation = True
        depth_num = "48,32,8"
        discard_percentage = float(pack["discard_percentage"])
    inputs = {k: pack[k] for k in ("image", "K1", "K2", "K3", "cam_to_world",
                                   "depth_min", "depth_max")}
    if inputs["image"].dtype == np.uint8:
        # Packs store quantized images (the runtime's own input domain);
        # replay converts exactly like the BGR uint8 path does.
        inputs["image"] = inputs["image"].astype(np.float32) / 255.0
    mk = None
    if os.path.exists(os.path.join(os.path.dirname(pack_path),
                                   "model_config.json")):
        mk = load_model_config(os.path.dirname(pack_path))
    outputs = run_model(variables, inputs, args or _A, model_kwargs=mk)
    worst = 0.0
    for k, v in outputs.items():
        ref = pack["out." + k]
        worst = max(worst, float(np.abs(ref - v).mean()))
    return worst


def export_stablehlo(variables, args, path: str,
                     model_kwargs=None) -> bool:
    """Serialize the stage-3 forward as a self-contained StableHLO module
    (jax.export): weights baked in as constants, fixed shapes, loadable
    and runnable WITHOUT this package's model code — the analogue of the
    reference's TorchScript deployable (cva_mvsnet/export_model.py,
    loaded by dr_mvsnet.cpp:376-). Multi-platform (cpu+tpu) lowering so
    one artifact serves both; falls back to the current platform when
    cross-lowering is unsupported. Returns True on success."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..models.cva_mvsnet import CvaMVSNet

    model = CvaMVSNet(**(model_kwargs
                         if model_kwargs is not None
                         else _model_kwargs_from_args(args)))
    vars_j = jax.tree.map(jnp.asarray, variables)

    def fwd(image, K1, K2, K3, c2w, dmin, dmax, disc):
        out = model.apply(vars_j, image, (K1, K2, K3), c2w, dmin, dmax,
                          depth_filter_discard_percentage=disc,
                          train=False)
        s = out.stage3
        return s.depth, s.confidence, s.depth_dense, s.confidence_dense

    H, W, V = args.height, args.width, args.view_num
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    specs = (sds((1, V, 3, H, W), f32), sds((1, 3, 3), f32),
             sds((1, 3, 3), f32), sds((1, 3, 3), f32),
             sds((1, V, 4, 4), f32), sds((1,), f32), sds((1,), f32),
             sds((1,), f32))
    for platforms in (("cpu", "tpu"), None):
        try:
            kw = {} if platforms is None else {"platforms": platforms}
            exp = jexport.export(jax.jit(fwd), **kw)(*specs)
            with open(path, "wb") as f:
                f.write(exp.serialize())
            print(f"stablehlo export: {os.path.getsize(path)} bytes, "
                  f"platforms={exp.platforms}")
            return True
        except Exception as e:  # cross-lowering support varies by version
            msg = str(e).splitlines()[0][:120]
            print(f"stablehlo export (platforms={platforms}) failed: {msg}")
    return False


def verify_stablehlo(out_dir: str) -> float:
    """Deserialize model.stablehlo and replay the golden pack through it;
    return the worst mean-abs-error vs the pack's recorded outputs."""
    import jax.numpy as jnp
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    pack = np.load(os.path.join(out_dir, "sample_inputs.npz"))
    image = pack["image"]
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    args = tuple(jnp.asarray(pack[k]) for k in
                 ("K1", "K2", "K3", "cam_to_world", "depth_min",
                  "depth_max"))
    disc = jnp.asarray(np.full((1,), float(pack["discard_percentage"]),
                               np.float32))
    d, c, dd, cd = exp.call(jnp.asarray(image), *args, disc)
    worst = 0.0
    for k, v in (("stage3.depth", d), ("stage3.confidence", c),
                 ("stage3.depth_dense", dd),
                 ("stage3.confidence_dense", cd)):
        worst = max(worst, float(np.abs(pack["out." + k]
                                        - np.asarray(v)).mean()))
    return worst


def main(args):
    from ..train.checkpoint import load_any

    os.makedirs(args.out_dir, exist_ok=True)
    variables = load_any(args.ckpt, view_aggregation=args.view_aggregation)

    inputs = build_inputs(args)
    outputs = run_model(variables, inputs, args)

    pack = dict(inputs)
    pack["discard_percentage"] = np.float32(args.discard_percentage)
    for k, v in outputs.items():
        pack["out." + k] = v
    pack_path = os.path.join(args.out_dir, "sample_inputs.npz")
    np.savez_compressed(pack_path, **pack)

    # Save weights alongside (the model.pt analogue)
    import pickle
    import jax
    with open(os.path.join(args.out_dir, "model_variables.pkl"), "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    # Self-describing unit: the runtime builds the model from this
    # (the reference's model.pt carries the architecture in its graph).
    import json
    with open(os.path.join(args.out_dir, "model_config.json"), "w") as f:
        json.dump(_model_kwargs_from_args(args), f, indent=1)

    # Human-inspectable depth/confidence PNGs (export_model.py:185-190)
    try:
        import cv2
        d = outputs["stage3.depth"][0]
        c = outputs["stage3.confidence"][0]
        cv2.imwrite(os.path.join(args.out_dir, "depth.png"),
                    (np.clip(d / max(d.max(), 1e-6), 0, 1) * 65535
                     ).astype(np.uint16))
        cv2.imwrite(os.path.join(args.out_dir, "confidence.png"),
                    (np.clip(c, 0, 1) * 65535).astype(np.uint16))
    except ImportError:
        pass

    if export_stablehlo(variables, args,
                        os.path.join(args.out_dir, "model.stablehlo")):
        serr = verify_stablehlo(args.out_dir)
        print(f"stablehlo golden replay mean-abs-error: {serr:.2e} "
              f"({'OK' if serr < GOLDEN_TOL else 'FAIL'})")
        assert serr < GOLDEN_TOL

    err = verify_golden(pack_path, variables, args)
    print(f"golden self-check mean-abs-error: {err:.2e} "
          f"({'OK' if err < GOLDEN_TOL else 'FAIL'})")
    assert err < GOLDEN_TOL


if __name__ == "__main__":
    main(parser.parse_args())
