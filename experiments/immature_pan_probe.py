"""Why does immature activation stall during the orbit pan?

Reconstructs the exact mid-pan situation from the adversarial fixture:
host KF at frame F0, immature candidates selected there, traced against
frames F0+1..F0+K with GROUND-TRUTH poses (so pose error is excluded),
then reports the gate-by-gate activation yield:
  valid / status!=OUTLIER / quality > thr / last_px < 8 / GN-ok.
Whichever gate eats the population is the starvation mechanism.
"""

import os
import sys

import numpy as np

FIX = "tests/fixtures/adv_traj/scene0"
F0 = 74
K = 14


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from tandem_tpu.tracking.immature import (MIN_TRACE_QUALITY,
                                              MAX_PIXEL_INTERVAL,
                                              STATUS_GOOD, STATUS_OOB,
                                              STATUS_OUTLIER, STATUS_UNINIT,
                                              activate_points, make_immature,
                                              trace_points)
    from tandem_tpu.data.undistort import PhotometricUndistorter

    # GT poses from the TUM file.
    from tandem_tpu.eval.ate import load_tum_trajectory
    from tandem_tpu.eval.ate import _pose44
    tum = load_tum_trajectory(os.path.join(FIX, "gt_tum.txt"))
    stamps = sorted(tum.keys())
    c2w = {i: _pose44(np.asarray(tum[t])) for i, t in enumerate(stamps)}

    photo = PhotometricUndistorter(os.path.join(FIX, "pcalib.txt"),
                                   os.path.join(FIX, "vignette.png"))

    def load(i):
        bgr = cv2.imread(os.path.join(FIX, "images", f"{i:06d}.png"))
        g = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        return jnp.asarray(photo.process(g))

    TFX = TFY = 200.0
    H, W = 192, 256
    Kt = (TFX, TFY, (W - 1) / 2.0, (H - 1) / 2.0)

    host_img = load(F0)
    # grid candidates on strong gradients
    g = np.asarray(host_img)
    gy, gx = np.gradient(g)
    mag = gx * gx + gy * gy
    ys, xs = np.mgrid[8:H - 8:4, 8:W - 8:4]
    m = mag[ys, xs]
    keep = m > np.quantile(m, 0.75)
    uv = np.stack([xs[keep], ys[keep]], -1).astype(np.float32)[:512]
    print(f"host frame {F0}: {len(uv)} candidates")

    pts = make_immature(jnp.asarray(uv), host_img)
    hc = jnp.asarray(c2w[F0].astype(np.float32))
    for j in range(1, K + 1):
        ti = F0 + j
        pts = trace_points(pts, hc, jnp.asarray(c2w[ti].astype(np.float32)),
                           load(ti), Kt)
        st = np.asarray(pts.status)
        lp = np.asarray(pts.last_px)
        q = np.asarray(pts.quality)
        base = float(np.linalg.norm(c2w[ti][:3, 3] - c2w[F0][:3, 3]))
        print(f"trace vs {ti} (baseline {base * 100:.1f} cm): "
              f"GOOD {int((st == STATUS_GOOD).sum())} "
              f"OOB {int((st == STATUS_OOB).sum())} "
              f"OUT {int((st == STATUS_OUTLIER).sum())} "
              f"UNINIT {int((st == STATUS_UNINIT).sum())} | "
              f"last_px med {np.median(lp[st == STATUS_GOOD]) if (st == STATUS_GOOD).any() else -1:.1f} "
              f"<8: {int((lp < MAX_PIXEL_INTERVAL).sum())} | "
              f"q med {np.median(q):.2f} >thr: "
              f"{int((q > MIN_TRACE_QUALITY).sum())}")

    tgt = F0 + K
    idep, ok = activate_points(pts, hc,
                               jnp.asarray(c2w[tgt].astype(np.float32)),
                               load(tgt), Kt)
    st = np.asarray(pts.status)
    lp = np.asarray(pts.last_px)
    q = np.asarray(pts.quality)
    not_out = (st != STATUS_OUTLIER) & (st != STATUS_UNINIT)
    print(f"activation vs {tgt}: ok {int(np.asarray(ok).sum())} / {len(uv)}")
    print(f"  gate breakdown: status ok {int(not_out.sum())}, "
          f"quality {int((q > MIN_TRACE_QUALITY).sum())}, "
          f"last_px<8 {int((lp < MAX_PIXEL_INTERVAL).sum())}, "
          f"all3 {int((not_out & (q > MIN_TRACE_QUALITY) & (lp < MAX_PIXEL_INTERVAL)).sum())}")
    # idepth sanity vs GT depth
    d = cv2.imread(os.path.join(FIX.replace('adv_traj', 'replica_traj'),
                                "depths", f"{0:06d}.png"), -1)


if __name__ == "__main__":
    main()
