"""Is the TPU's 20% golden error from bf16 STORAGE (model dtype) or from
the f32->bf16 single-pass MXU rounding of the f32 replay?

Replays the trained golden pack with the model built at dtype=bfloat16
(the runtime's actual configuration) on the current backend, under
default and highest matmul precision, and reports per-stage MAE. Compare
with tpu_precision_probe (f32 dtype): f32+default = 2.4e-1,
f32+highest = 3.3e-4.
"""

import pickle

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.cli.tandem_export import load_model_config
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet

    with open("exported/tandem/model_variables.pkl", "rb") as f:
        variables = pickle.load(f)
    pack = np.load("exported/tandem/sample_inputs.npz")
    mk = load_model_config("exported/tandem")
    img = pack["image"]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0

    print(f"backend: {jax.default_backend()}")
    for prec in (None, "highest"):
        model = CvaMVSNet(**mk, dtype=jnp.bfloat16)

        @jax.jit
        def forward(variables, image, K1, K2, K3, c2w, dmin, dmax, disc):
            return model.apply(variables, image, (K1, K2, K3), c2w, dmin,
                               dmax, depth_filter_discard_percentage=disc,
                               train=False)

        ctx = jax.default_matmul_precision(prec) if prec else _null()
        with ctx:
            out = forward(variables, jnp.asarray(img),
                          jnp.asarray(pack["K1"]), jnp.asarray(pack["K2"]),
                          jnp.asarray(pack["K3"]),
                          jnp.asarray(pack["cam_to_world"]),
                          jnp.asarray(pack["depth_min"]),
                          jnp.asarray(pack["depth_max"]),
                          jnp.full((1,), float(pack["discard_percentage"])))
        for stage in ("stage1", "stage2", "stage3"):
            s = getattr(out, stage)
            d = np.asarray(s.depth_dense, np.float32)[0]
            ref = pack[f"out.{stage}.depth_dense"][0]
            print(f"bf16-dtype prec={prec or 'default'} {stage}: "
                  f"MAE {np.abs(d - ref).mean():.4f} m", flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
