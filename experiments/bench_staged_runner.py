"""Chained per-stage cascade vs the monolithic forward jit.

Components measured alone now sum to ~150-165 ms while the monolithic
640x480 V=7 forward measures ~198 — XLA's scheduling of the composed
program bleeds the difference. This builds the cascade as chained jits
(feature net | per-stage range+warp+agg+costreg+post | edge filter) over
the SAME variables/model and times the whole keyframe forward.

Run: timeout 2400 python experiments/bench_staged_runner.py
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.models.cva_mvsnet import STAGES, CvaMVSNet
from tandem_tpu.models.edge_filter import depth_filter_edges
from tandem_tpu.models.layers import interpolate_bilinear
from tandem_tpu.models.ranges import adaptive_depth_range, uniform_depth_range
from tandem_tpu.pipeline.mvsnet_runner import init_variables
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

H, W, V = 480, 640, 7


def main():
    force_real_timing()
    model = CvaMVSNet(view_aggregation=True, dtype=jnp.bfloat16)
    variables = init_variables(model, H, W, V)
    rng = np.random.RandomState(0)
    image = jax.device_put(rng.rand(1, V, 3, H, W).astype(np.float32))
    fx = 387.8
    K3 = np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2], [0, 0, 1]],
                  np.float32)
    Ks = []
    for s in (0.25, 0.5, 1.0):
        K = K3.copy()
        K[:2] *= s
        Ks.append(jax.device_put(K[None]))
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.08 * v
        c2w[0, v, 1, 3] = 0.02 * v
    c2w = jax.device_put(c2w)
    dmin = jax.device_put(np.full((1,), 0.5, np.float32))
    dmax = jax.device_put(np.full((1,), 6.0, np.float32))
    discard = jax.device_put(np.full((1,), 10.0, np.float32))

    def feats_m(m, image):
        B, V_, C, Hh, Ww = image.shape
        img = jnp.transpose(image, (0, 1, 3, 4, 2)).reshape(
            B * V_, Hh, Ww, C).astype(m.dtype)
        f = m.feature_net(img, train=False)
        return tuple(f[s].reshape(B, V_, *f[s].shape[1:]) for s in STAGES)

    feats_j = jax.jit(lambda v, img: model.apply(v, img, method=feats_m))

    def stage_m(m, feat, K, c2w, ds, i):
        s = STAGES[i]
        gate = m.volume_gates[s] if m.view_aggregation else None
        out = m._depth_prediction(feat, K, c2w, ds, m.cost_reg[s], gate,
                                  False)
        return out["depth"], out["confidence"]

    stage_js = [
        jax.jit(partial(
            lambda v, f, K, c2w, ds, i: model.apply(
                v, f, K, c2w, ds, i,
                method=lambda m, f, K, c2w, ds, i: stage_m(
                    m, f, K, c2w, ds, i)), i=i))
        for i in range(3)
    ]

    @jax.jit
    def range1(dmin, dmax):
        return uniform_depth_range(depth_min=dmin, depth_max=dmax,
                                   depth_num=model.depth_num[0],
                                   height=H // 4, width=W // 4)

    def make_rangeN(i, hs, ws):
        @jax.jit
        def rangeN(prev_depth, base_interval):
            up = interpolate_bilinear(prev_depth[..., None].astype(
                jnp.float32), hs, ws, align_corners=False)[..., 0]
            return adaptive_depth_range(
                depth=up, interval=model.depth_interval_ratio[i]
                * base_interval, depth_num=model.depth_num[i])
        return rangeN

    range2 = make_rangeN(1, H // 2, W // 2)
    range3 = make_rangeN(2, H, W)

    @jax.jit
    def edge(depth, conf, discard):
        fd, mask = depth_filter_edges(depth, discard)
        return fd, jnp.where(mask, 0.0, conf)

    def staged_step():
        f1, f2, f3 = feats_j(variables, image)
        ds1, base = range1(dmin, dmax)
        d1, c1 = stage_js[0](variables, f1, Ks[0], c2w, ds1)
        ds2 = range2(d1, base)
        d2, c2 = stage_js[1](variables, f2, Ks[1], c2w, ds2)
        ds3 = range3(d2, base)
        d3, c3 = stage_js[2](variables, f3, Ks[2], c2w, ds3)
        return edge(d3, c3, discard)

    out = jax.block_until_ready(staged_step())

    # Parity vs the monolithic forward.
    @jax.jit
    def forward(variables, image, K1, K2, K3, c2w, dmin, dmax):
        o = model.apply(variables, image, (K1, K2, K3), c2w, dmin, dmax,
                        depth_filter_discard_percentage=None, train=False)
        return o.stage3.depth, o.stage3.confidence

    d_ref, c_ref = forward(variables, image, *Ks, c2w, dmin, dmax)
    fd_ref, fc_ref = edge(d_ref, c_ref, discard)
    err = float(jnp.abs(out[0] - fd_ref).max())
    print(f"staged vs monolith max |d| err: {err:.2e}", flush=True)

    t_staged = device_time(staged_step, iters=8) * 1e3
    print(f"staged cascade: {t_staged:7.1f} ms", flush=True)

    margs = (variables, image, *Ks, c2w, dmin, dmax)

    def mono_step():
        d, c = forward(*margs)
        return edge(d, c, discard)
    jax.block_until_ready(mono_step())
    t_mono = device_time(mono_step, iters=8) * 1e3
    print(f"monolithic:     {t_mono:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
