"""Attribute render_depth_splat's device time to its internal stages.

Round-5 follow-up to bench_fusion_breakdown (splat 18.5 ms at 5493
blocks): which part — pair-table build, neighbour-face gathers, candidate
math, the argmin/one-hot column reduction, or the final scatter-min — is
actually paying? Each variant runs the real _splat_chunk code path with a
piece short-circuited, on the same realistic scan as the breakdown bench.

Run: timeout 2400 python -u experiments/bench_splat_internals.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.mapping import tsdf as T
from tandem_tpu.utils.benchmarking import (device_time, force_real_timing,
                                           measure_rtt)

H, W = 480, 640


def build_volume():
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
    return cfg, vol, K, pose


def main():
    force_real_timing()
    print(f"RTT {measure_rtt() * 1e3:.1f} ms")
    cfg, vol, K, pose = build_volume()
    n = int(vol.n_allocated)
    chunk = 2048
    print(f"allocated {n} blocks")

    w2c_R, w2c_t, zbuf0 = T._splat_init(pose, H, W)
    pair_tab = T._pair_table(vol, n, chunk)
    jax.block_until_ready(pair_tab)

    # --- baseline: full splat (loop over chunks, donated zbuf chain) ----
    def full():
        zbuf = jnp.full((H * W,), jnp.inf)
        for start in range(0, n, chunk):
            zbuf = T._splat_chunk(cfg, zbuf, vol, pair_tab, K, w2c_R,
                                  w2c_t, start, chunk, H, W)
        return zbuf
    t = device_time(full, iters=10) * 1e3
    print(f"full splat ({-(-n // chunk)} chunks)   {t:7.2f} ms")

    # --- pair table build alone ----------------------------------------
    t = device_time(lambda: T._pair_table(vol, n, chunk), iters=10) * 1e3
    print(f"pair_table build          {t:7.2f} ms")

    # --- candidates only: same math, returns per-chunk reduced sum ------
    @partial(jax.jit, static_argnums=(0, 8, 9, 10))
    def chunk_nosct(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t, start,
                    chunk, H, W):
        coords = jax.lax.dynamic_slice_in_dim(vol.block_coords, start,
                                              chunk, 0)
        tsdf_c = jax.lax.dynamic_slice_in_dim(vol.tsdf, start, chunk, 0)
        weight_c = jax.lax.dynamic_slice_in_dim(vol.weight, start, chunk, 0)
        slot_active = ((start + jnp.arange(chunk)) < vol.n_allocated)
        flat, zval = _core_candidates(cfg, vol, pair_tab, K, w2c_R, w2c_t,
                                      coords, tsdf_c, weight_c, slot_active,
                                      chunk, H, W)
        return zbuf + jnp.sum(jnp.where(jnp.isfinite(zval), zval, 0.0)) \
            + jnp.sum(flat).astype(jnp.float32) * 0.0

    def _core_candidates(cfg, vol, pair_tab, K, w2c_R, w2c_t, coords,
                         tsdf_c, weight_c, slot_active, chunk, H, W):
        # mirror of _splat_core up to (but excluding) the scatter
        import tandem_tpu.mapping.tsdf as M
        b = cfg.block_size
        B3 = b ** 3
        vs = cfg.voxel_size
        P = pair_tab.shape[0] // B3
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        jk = jnp.arange(b * b, dtype=jnp.int32)
        o1, o2 = jk // b, jk % b
        li = jnp.arange(B3, dtype=jnp.int32)
        lx = (li % b).astype(jnp.float32)
        ly = ((li // b) % b).astype(jnp.float32)
        lz = (li // (b * b)).astype(jnp.float32)
        base = coords.astype(jnp.float32) * b
        active512 = slot_active[:, None]
        flats, zs = [], []
        for a, dim, face_li, l_o1, l_o2, col_o1, col_o2 in (
                (0, 3, o1 * (b * b) + o2 * b, lz, ly, 2, 1),
                (1, 2, o1 * (b * b) + o2, lz, lx, 2, 0),
                (2, 1, o1 * b + o2, ly, lx, 1, 0)):
            la = (lx, ly, lz)[a]
            nb_block = coords.at[:, a].add(1)
            flat_tab, in_arena = M._table_index(cfg, nb_block)
            nb_slot = vol.page_table[flat_tab]
            nb_ok = (nb_slot >= 0) & (nb_slot < P) & in_arena
            rows = (jnp.where(nb_ok, nb_slot, 0)[:, None] * B3
                    + face_li[None])
            nb = pair_tab[rows.reshape(-1)].reshape(chunk, b * b, 8)
            s_nb = (nb[..., 0].astype(jnp.float32)
                    + nb[..., 1].astype(jnp.float32))
            w_nb = jnp.where(nb_ok[:, None],
                             nb[..., 2].astype(jnp.float32), 0.0)
            view = (chunk,) + (b,) * 3
            sA = tsdf_c.reshape(view)
            wA = weight_c.reshape(view)
            sl = [slice(None)] * 4
            sl[dim] = slice(1, None)
            fshape = [chunk, b, b, b]
            fshape[dim] = 1
            s1 = jnp.concatenate(
                [sA[tuple(sl)], s_nb.reshape(fshape)], dim).reshape(chunk,
                                                                    B3)
            w1 = jnp.concatenate(
                [wA[tuple(sl)], w_nb.reshape(fshape)], dim).reshape(chunk,
                                                                    B3)
            s0, w0 = tsdf_c, weight_c
            valid = ((w0 > 0) & (w1 > 0) & (s0 * s1 <= 0)
                     & ~((s0 == 0) & (s1 == 0)))
            denom = s0 - s1
            t = jnp.clip(
                s0 / jnp.where(jnp.abs(denom) < 1e-20, 1.0, denom),
                0.0, 1.0)
            zc = ((w2c_R[2, col_o1] * (base[:, col_o1, None] + l_o1[None])
                   + w2c_R[2, col_o2] * (base[:, col_o2, None] + l_o2[None])
                   + w2c_R[2, a] * (base[:, a, None] + la[None] + t)) * vs
                  + w2c_t[2])
            zc = jnp.where(valid & active512, zc, jnp.inf)
            red = zc.reshape(view)
            gmin = jnp.argmin(red, axis=dim)
            oh = jnp.expand_dims(
                jnp.arange(b), [d for d in range(3) if d != dim - 1]
            )[None] == jnp.expand_dims(gmin, dim)
            t_sel = jnp.sum(jnp.where(oh, t.reshape(view), 0.0), dim)
            z_out = jnp.sum(jnp.where(oh, red, 0.0), dim)
            any_valid = jnp.isfinite(z_out) & (z_out > 0)
            gmin = gmin.reshape(chunk, b * b)
            t_sel = t_sel.reshape(chunk, b * b)
            z_out = z_out.reshape(chunk, b * b)
            any_valid = any_valid.reshape(chunk, b * b)
            ca = base[:, a, None] + gmin.astype(jnp.float32) + t_sel
            c_o1 = base[:, col_o1, None] + o1.astype(jnp.float32)[None]
            c_o2 = base[:, col_o2, None] + o2.astype(jnp.float32)[None]
            p = [None, None, None]
            p[a], p[col_o1], p[col_o2] = ca, c_o1, c_o2
            xc = (w2c_R[0, 0] * p[0] + w2c_R[0, 1] * p[1]
                  + w2c_R[0, 2] * p[2]) * vs + w2c_t[0]
            yc = (w2c_R[1, 0] * p[0] + w2c_R[1, 1] * p[1]
                  + w2c_R[1, 2] * p[2]) * vs + w2c_t[1]
            z_safe = jnp.where(z_out <= 1e-6, 1.0, z_out)
            u = jnp.round(fx * xc / z_safe + cx).astype(jnp.int32)
            v = jnp.round(fy * yc / z_safe + cy).astype(jnp.int32)
            ok = (any_valid & (z_out > cfg.min_depth)
                  & (u >= 0) & (u < W) & (v >= 0) & (v < H))
            flats.append(jnp.where(ok, v * W + u, H * W).reshape(-1))
            zs.append(jnp.where(ok, z_out, jnp.inf).reshape(-1))
        return jnp.concatenate(flats), jnp.concatenate(zs)

    def nosct():
        zbuf = jnp.zeros(())
        for start in range(0, n, chunk):
            zbuf = chunk_nosct(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t,
                               start, chunk, H, W)
        return zbuf
    t = device_time(nosct, iters=10) * 1e3
    print(f"candidates only (no scatter) {t:7.2f} ms")

    # --- scatter only: precomputed candidate rows ----------------------
    flats, zvals = [], []
    for start in range(0, n, chunk):
        coords = jax.lax.dynamic_slice_in_dim(vol.block_coords, start,
                                              chunk, 0)
        tsdf_c = jax.lax.dynamic_slice_in_dim(vol.tsdf, start, chunk, 0)
        weight_c = jax.lax.dynamic_slice_in_dim(vol.weight, start, chunk, 0)
        slot_active = ((start + jnp.arange(chunk)) < vol.n_allocated)
        f, z = _core_candidates(cfg, vol, pair_tab, K, w2c_R, w2c_t,
                                coords, tsdf_c, weight_c, slot_active,
                                chunk, H, W)
        flats.append(f)
        zvals.append(z)
    flats = [jax.device_put(np.asarray(f)) for f in flats]
    zvals = [jax.device_put(np.asarray(z)) for z in zvals]

    @jax.jit
    def sct_only(zbuf, flat, zval):
        return zbuf.at[flat].min(zval, mode="drop")

    def sct():
        zbuf = jnp.full((H * W,), jnp.inf)
        for f, z in zip(flats, zvals):
            zbuf = sct_only(zbuf, f, z)
        return zbuf
    t = device_time(sct, iters=10) * 1e3
    nrows = sum(f.shape[0] for f in flats)
    print(f"scatter only ({nrows} rows) {t:7.2f} ms")

    valid_rows = sum(int((np.asarray(f) < H * W).sum()) for f in flats)
    print(f"valid rows {valid_rows} ({valid_rows / nrows:.1%})")


if __name__ == "__main__":
    main()
