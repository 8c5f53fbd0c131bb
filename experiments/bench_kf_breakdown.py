"""Per-piece device-time breakdown of the flagship KF pipeline (round 4).

Times every element of bench.py's 104.6 ms/KF budget separately at the
deployed abl04 shape ((48,4,4), V=7, 640x480, bf16): the staged cascade's
feature pass / range / per-stage programs / edge filter, and the TSDF
allocate / integrate / splat-render pieces — so the optimization targets
(VERDICT r4 #5 fusion < 20 ms, #6 FeatureNet) are attacked with current
numbers, not round-3 recollections.

Run: timeout 2400 python -u experiments/bench_kf_breakdown.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.mapping.tsdf import (TsdfConfig, allocate_blocks,
                                     create_volume, integrate,
                                     render_depth_splat)
from tandem_tpu.models.cva_mvsnet import STAGES, CvaMVSNet
from tandem_tpu.models.edge_filter import depth_filter_edges
from tandem_tpu.models.layers import interpolate_bilinear
from tandem_tpu.models.ranges import adaptive_depth_range, uniform_depth_range
from tandem_tpu.pipeline.mvsnet_runner import init_variables
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

H, W, V = 480, 640, 7


def main():
    force_real_timing()
    model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True,
                      dtype=jnp.bfloat16)
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

    # Materialize chain intermediates once.
    f1, f2, f3 = jax.block_until_ready(feats_j(variables, image))
    ds1, base = jax.block_until_ready(range1(dmin, dmax))
    d1, c1 = jax.block_until_ready(stage_js[0](variables, f1, Ks[0], c2w,
                                               ds1))
    ds2 = jax.block_until_ready(range2(d1, base))
    d2, c2 = jax.block_until_ready(stage_js[1](variables, f2, Ks[1], c2w,
                                               ds2))
    ds3 = jax.block_until_ready(range3(d2, base))
    d3, c3 = jax.block_until_ready(stage_js[2](variables, f3, Ks[2], c2w,
                                               ds3))

    pieces = [
        ("feats", lambda: feats_j(variables, image)[0]),
        ("range1", lambda: range1(dmin, dmax)[0]),
        ("stage1(48@160x120)", lambda: stage_js[0](variables, f1, Ks[0],
                                                   c2w, ds1)[0]),
        ("range2", lambda: range2(d1, base)),
        ("stage2(4@320x240)", lambda: stage_js[1](variables, f2, Ks[1],
                                                  c2w, ds2)[0]),
        ("range3", lambda: range3(d2, base)),
        ("stage3(4@640x480)", lambda: stage_js[2](variables, f3, Ks[2],
                                                  c2w, ds3)[0]),
        ("edge", lambda: edge(d3, c3, discard)[0]),
    ]
    total = 0.0
    for name, fn in pieces:
        t = device_time(fn, iters=10) * 1e3
        total += t
        print(f"{name:22s} {t:7.2f} ms", flush=True)
    print(f"{'SUM':22s} {total:7.2f} ms", flush=True)

    def staged_step():
        f1, f2, f3 = feats_j(variables, image)
        ds1, base = range1(dmin, dmax)
        d1, _ = stage_js[0](variables, f1, Ks[0], c2w, ds1)
        ds2 = range2(d1, base)
        d2, _ = stage_js[1](variables, f2, Ks[1], c2w, ds2)
        ds3 = range3(d2, base)
        d3, c3 = stage_js[2](variables, f3, Ks[2], c2w, ds3)
        return edge(d3, c3, discard)
    t_chain = device_time(staged_step, iters=8) * 1e3
    print(f"{'CHAIN (=bench MVSNet)':22s} {t_chain:7.2f} ms", flush=True)

    # ---- TSDF pieces ----------------------------------------------------
    cfg = TsdfConfig()
    Kd = jnp.asarray(K3)
    pose = jnp.asarray(np.eye(4, dtype=np.float32))
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth_np = (2.0 + 0.3 * np.sin(u * 0.05) * np.cos(v * 0.04)).astype(
        np.float32)
    color_np = np.stack([u % 255, v % 255, (u + v) % 255], -1).astype(
        np.float32)
    depth_d = jnp.asarray(depth_np)
    color_d = jnp.asarray(color_np)
    vol = create_volume(cfg)
    vol = allocate_blocks(cfg, vol, depth_d, Kd, pose)
    n_alloc = int(vol.n_allocated)
    n_pad = -(-max(n_alloc, 1) // 2048) * 2048
    print(f"allocated blocks: {n_alloc} (pad {n_pad})", flush=True)

    state = {"vol": vol}

    def integrate_step():
        state["vol"] = integrate(cfg, state["vol"], depth_d, color_d, Kd,
                                 pose, n_allocated=n_pad)
        return state["vol"].tsdf

    t_int = device_time(integrate_step, iters=10) * 1e3
    print(f"{'tsdf integrate':22s} {t_int:7.2f} ms", flush=True)

    t_rend = device_time(
        lambda: render_depth_splat(cfg, state["vol"], Kd, pose, H, W,
                                   n_allocated=n_pad), iters=10) * 1e3
    print(f"{'tsdf render_splat':22s} {t_rend:7.2f} ms", flush=True)

    # allocate on a FRESH volume each call (donation): time amortized via
    # enqueue of K calls on distinct inputs is not possible with donation;
    # approximate with sync-per-call minus RTT instead.
    import time as _time
    from tandem_tpu.utils.benchmarking import measure_rtt
    rtt = measure_rtt()
    ts = []
    for _ in range(6):
        v2 = create_volume(cfg)
        jax.block_until_ready(v2.tsdf)
        t0 = _time.perf_counter()
        v2 = allocate_blocks(cfg, v2, depth_d, Kd, pose)
        jax.block_until_ready(v2.n_allocated)
        ts.append(_time.perf_counter() - t0 - rtt)
    print(f"{'tsdf allocate(sync)':22s} {min(ts) * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
