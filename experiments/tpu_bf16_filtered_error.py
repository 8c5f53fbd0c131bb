"""What depth error does the RUNTIME see at bf16-default on TPU?

The golden replay's worst MAE 2.4e-1 (tpu_precision_probe) averages over
the DENSE stage outputs. The SLAM pipeline consumes the edge-FILTERED
depth (confidence-ranked keep) and weights dense-tracking residuals by
confidence — so the operative numbers are the error on kept pixels and
the error-vs-confidence profile.
"""

import pickle

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.cli.tandem_export import load_model_config, run_model

    with open("exported/tandem/model_variables.pkl", "rb") as f:
        variables = pickle.load(f)
    pack = np.load("exported/tandem/sample_inputs.npz")

    class _A:
        view_aggregation = True
        depth_num = "48,32,8"
        discard_percentage = float(pack["discard_percentage"])

    inputs = {k: pack[k] for k in ("image", "K1", "K2", "K3",
                                   "cam_to_world", "depth_min", "depth_max")}
    if inputs["image"].dtype == np.uint8:
        inputs["image"] = inputs["image"].astype(np.float32) / 255.0
    mk = load_model_config("exported/tandem")
    out = run_model(variables, inputs, _A, model_kwargs=mk)

    print(f"backend: {jax.default_backend()}")
    for stage in ("stage1", "stage2", "stage3"):
        d = out[f"{stage}.depth_dense"][0]
        ref_d = pack[f"out.{stage}.depth_dense"][0]
        conf = out[f"{stage}.confidence_dense"][0]
        err = np.abs(d - ref_d)
        med_ref = np.median(ref_d)
        print(f"{stage}: dense MAE {err.mean():.4f} m  (median depth "
              f"{med_ref:.2f} m, rel {err.mean() / med_ref * 100:.1f}%)")
        for q in (0.5, 0.75, 0.9):
            thr = np.quantile(conf, q)
            m = conf >= thr
            print(f"   conf>=p{int(q * 100)}: MAE {err[m].mean():.4f} m "
                  f"({err[m].mean() / med_ref * 100:.2f}%), "
                  f"p95 {np.quantile(err[m], 0.95):.4f} m")
    # The filtered (sparse) outputs the backend delivers:
    d3 = out["stage3.depth"][0]
    r3 = pack["out.stage3.depth"][0]
    kept = (d3 > 0) & (r3 > 0)
    both = np.abs(d3 - r3)[kept]
    print(f"edge-filtered stage3 (runtime payload): kept {kept.mean():.2%} "
          f"both, MAE {both.mean():.4f} m, p95 {np.quantile(both, .95):.4f}")
    agree = ((d3 > 0) == (r3 > 0)).mean()
    print(f"keep-mask agreement vs f32 goldens: {agree:.2%}")


if __name__ == "__main__":
    main()
