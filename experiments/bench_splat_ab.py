"""A/B/C the axis-culled splat program structure, interleaved with repeats.

A: 3 gather + 3 per-axis programs (candidates + own scatter each)
C: full splat (3 chunks x 3 axes, no surface cull)        [baseline]
D: 1 merged gather + 3 per-axis programs, full render     [current]
(B, one merged compute program, measured 12.09 vs A 10.95 and was cut)

Single runs of the fusion breakdown swung 12.2 -> 14.0 -> 17.0 ms for the
same work; this probe interleaves the variants and reports per-variant
medians so the architecture choice rests on a stable number.

Run: timeout 1800 python -u experiments/bench_splat_ab.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.mapping import tsdf as T
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

H, W = 480, 640


@partial(jax.jit, static_argnums=(0, 8, 9, 10, 11), donate_argnums=(1,))
def _axis_prog(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t, rows, n_rows,
               Hh, Ww, axis):
    tsdf_c, weight_c, coords, active = rows
    flat, zval = T._splat_axis_candidates(cfg, vol, pair_tab, K, w2c_R,
                                          w2c_t, coords, tsdf_c, weight_c,
                                          active, n_rows, Hh, Ww, axis)
    return zbuf.at[flat].min(zval, mode="drop")


def main():
    force_real_timing()
    cfg = T.TsdfConfig()
    fx = 387.8
    K = jnp.asarray(np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2],
                              [0, 0, 1]], np.float32))
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth = jnp.asarray((2.0 + 0.3 * np.sin(u * 0.05)
                         * np.cos(v * 0.04)).astype(np.float32))
    color = jnp.asarray(np.stack([u % 255, v % 255, (u + v) % 255],
                                 -1).astype(np.float32))
    pose = jnp.asarray(np.eye(4, dtype=np.float32))
    vol = T.create_volume(cfg)
    vol = T.allocate_blocks(cfg, vol, depth, K, pose)
    vol = T.integrate(cfg, vol, depth, color, K, pose)
    n = int(vol.n_allocated)
    n_pad = -(-max(n, 1) // 2048) * 2048
    chunk = 2048

    ax_slots, ax_counts = T.surface_axis_slots(cfg, vol, K, pose, H, W,
                                               n_pad)
    counts = [int(c) for c in np.asarray(ax_counts)]
    print(f"allocated {n}, axis counts {counts}")
    n_max = T._pad_sched(max(counts), cfg.pool_size)

    w2c_R, w2c_t, _ = T._splat_init(pose, H, W)
    pair_tab = T._pair_table(vol, n, chunk)
    jax.block_until_ready(pair_tab)

    def variant_a():
        zbuf = jnp.full((H * W,), jnp.inf)
        for axis in range(3):
            c_pad = T._pad_sched(counts[axis], cfg.pool_size)
            rows = T._gather_block_rows(cfg, c_pad, vol, ax_slots[axis])
            zbuf = _axis_prog(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t,
                              rows, c_pad, H, W, axis)
        return zbuf


    def variant_c():
        zbuf = jnp.full((H * W,), jnp.inf)
        for start in range(0, n, chunk):
            zbuf = T._splat_chunk(cfg, zbuf, vol, pair_tab, K, w2c_R,
                                  w2c_t, start, chunk, H, W)
        return zbuf

    def variant_d():
        return T.render_depth_splat(cfg, vol, K, pose, H, W,
                                    n_allocated=n, axis_slots=ax_slots,
                                    axis_counts=counts)

    from functools import partial as _p

    @_p(jax.jit, static_argnums=(0, 7, 8, 9, 10))
    def _cand_prog(cfgs, vol, pair_tab, Ks, R, t, rows, n_rows, Hh, Ww,
                   axis):
        tsdf_c, weight_c, coords, active = rows
        return T._splat_axis_candidates(cfgs, vol, pair_tab, Ks, R, t,
                                        coords, tsdf_c, weight_c, active,
                                        n_rows, Hh, Ww, axis)

    @_p(jax.jit, donate_argnums=(0,))
    def _sct_prog(zbuf, f0, z0, f1, z1, f2, z2):
        return zbuf.at[jnp.concatenate([f0, f1, f2])].min(
            jnp.concatenate([z0, z1, z2]), mode="drop")

    def variant_e():
        zbuf = jnp.full((H * W,), jnp.inf)
        fz = []
        for axis in range(3):
            c_pad = T._pad_sched(counts[axis], cfg.pool_size)
            rows = T._gather_block_rows(cfg, c_pad, vol, ax_slots[axis])
            fz.append(_cand_prog(cfg, vol, pair_tab, K, w2c_R, w2c_t,
                                 rows, c_pad, H, W, axis))
        return _sct_prog(zbuf, fz[0][0], fz[0][1], fz[1][0], fz[1][1],
                         fz[2][0], fz[2][1])

    variants = [("A 3g+3p       ", variant_a),
                ("C full-chunks ", variant_c),
                ("D 1g+3p (cur) ", variant_d),
                ("E 3cand+1sct  ", variant_e)]
    results = {name: [] for name, _ in variants}
    for _ in range(5):
        for name, fn in variants:
            results[name].append(device_time(fn, iters=10) * 1e3)
    for name, _ in variants:
        r = sorted(results[name])
        print(f"{name}  median {r[len(r) // 2]:6.2f} ms   runs "
              + " ".join(f"{x:.2f}" for x in results[name]))


if __name__ == "__main__":
    main()
