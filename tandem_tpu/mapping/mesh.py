"""Mesh extraction from the TSDF volume (marching tetrahedra).

Replaces the reference's CUDA marching-cubes extractor
(tandem/libdr/dr_fusion/src/marching_cubes/mesh_extractor.cu:244-265 +
lookup_tables.h). Mesh extraction is off the critical path (it runs every
``mesh_extraction_freq`` keyframes, tandem_backend.cpp:194-203), so the design
splits the work: corner-sdf grids are sampled on device in fixed-shape chunks
(reusing the volume lookup), and the data-dependent triangle assembly runs
vectorized on host. Marching tetrahedra (6 tets per cell sharing the main
diagonal) avoids the 256-case MC tables while producing a watertight surface
at the sdf=0 isolevel.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tsdf import TsdfConfig, TsdfVolume, _get_voxels

# 6-tetrahedra decomposition of the unit cell; corner i has coordinates
# ((i>>0)&1, (i>>1)&1, (i>>2)&1); all tets share the 0-7 diagonal.
_TETS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7],
], np.int32)

_CORNER_OFFSETS = np.array([[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1]
                            for i in range(8)], np.int32)


@partial(jax.jit, static_argnums=(0,))
def _corner_grids(cfg: TsdfConfig, vol: TsdfVolume, slots):
    """Sample (b+1)^3 corner sdf/weight/color grids for a chunk of pool slots.

    :param slots: (C,) int32 pool indices
    :return: sdf (C, b+1, b+1, b+1), weight (...), color (..., 3)
    """
    b = cfg.block_size
    n = b + 1
    coords = vol.block_coords[slots]  # (C, 3)
    r = jnp.arange(n, dtype=jnp.int32)
    gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
    local = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (n^3, 3)
    pts = ((coords[:, None, :] * b + local[None]).astype(jnp.float32)
           * cfg.voxel_size)  # (C, n^3, 3)
    C = pts.shape[0]
    sdf, w, col = _get_voxels(cfg, vol, pts.reshape(-1, 3))
    return (sdf.reshape(C, n, n, n), w.reshape(C, n, n, n),
            col.reshape(C, n, n, n, 3))


def extract_mesh(cfg: TsdfConfig, vol: TsdfVolume,
                 chunk: int = 512) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """:return: vertices (N, 3) float32, faces (M, 3) int32, colors (N, 3)
    uint8."""
    n_alloc = int(vol.n_allocated)
    b = cfg.block_size

    verts_out, cols_out = [], []
    # One D2H of the (jit-output) coord table; numpy slicing after. Slicing
    # the device array per chunk would be an eager op whose numpy pull
    # poisons remote dispatch for the process.
    coords_all = np.asarray(vol.block_coords)

    for start in range(0, n_alloc, chunk):
        count = min(chunk, n_alloc - start)
        slots = jnp.asarray(np.arange(start, start + chunk, dtype=np.int32))
        sdf, w, col = _corner_grids(cfg, vol, slots)
        sdf = np.asarray(sdf)[:count]
        w = np.asarray(w)[:count]
        col = np.asarray(col)[:count]
        coords = coords_all[start:start + count]

        # Cells: (C, b, b, b, 8) corner values
        cs = np.stack([sdf[:, ox:ox + b, oy:oy + b, oz:oz + b]
                       for ox, oy, oz in _CORNER_OFFSETS], -1)
        cw = np.stack([w[:, ox:ox + b, oy:oy + b, oz:oz + b]
                       for ox, oy, oz in _CORNER_OFFSETS], -1)
        cc = np.stack([col[:, ox:ox + b, oy:oy + b, oz:oz + b]
                       for ox, oy, oz in _CORNER_OFFSETS], -2)  # (...,8,3)

        valid = (cw > 0).all(-1)
        sign_change = (cs < 0).any(-1) & (cs >= 0).any(-1)
        sel = np.argwhere(valid & sign_change)  # (M, 4): block, x, y, z
        if sel.shape[0] == 0:
            continue

        bidx = sel[:, 0]
        cell = sel[:, 1:]  # (M, 3)
        s8 = cs[sel[:, 0], sel[:, 1], sel[:, 2], sel[:, 3]]       # (M, 8)
        c8 = cc[sel[:, 0], sel[:, 1], sel[:, 2], sel[:, 3]]       # (M, 8, 3)
        base = ((coords[bidx] * b + cell).astype(np.float64)
                * cfg.voxel_size)  # (M, 3) cell corner-0 world position
        p8 = base[:, None, :] + _CORNER_OFFSETS[None] * cfg.voxel_size

        v, c = _march_tets(s8, p8, c8)
        if v.shape[0]:
            verts_out.append(v.astype(np.float32))
            cols_out.append(c)

    if not verts_out:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.uint8))
    verts = np.concatenate(verts_out)
    cols = np.concatenate(cols_out)
    faces = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
    return verts, faces, cols.astype(np.uint8)


def _march_tets(s8, p8, c8):
    """Triangulate cells via 6 tetrahedra each.

    :param s8: (M, 8) corner sdf; p8: (M, 8, 3) positions; c8: (M, 8, 3) colors
    :return: flat triangle vertices (3*T, 3) and vertex colors (3*T, 3)
    """
    verts, cols = [], []
    for tet in _TETS:
        s = s8[:, tet]            # (M, 4)
        p = p8[:, tet]            # (M, 4, 3)
        c = c8[:, tet]            # (M, 4, 3)
        neg = s < 0
        count = neg.sum(-1)

        def edge(ia, ib):
            sa, sb = s[:, ia], s[:, ib]
            tpar = sa / np.where(np.abs(sa - sb) < 1e-12, 1e-12, sa - sb)
            tpar = np.clip(tpar, 0.0, 1.0)[:, None]
            v = p[:, ia] + tpar * (p[:, ib] - p[:, ia])
            col = c[:, ia] + tpar * (c[:, ib] - c[:, ia])
            return v, col

        # one corner inside (or three inside -> complementary corner)
        for k, single_neg in ((1, True), (3, False)):
            m = count == k
            if not m.any():
                continue
            inside = neg if single_neg else ~neg
            a = inside[m].argmax(-1)  # the lone corner
            others = np.array([[j for j in range(4) if j != i]
                               for i in range(4)])
            oth = others[a]  # (K, 3)
            sm, pm, cm = s[m], p[m], c[m]
            for tri_i in range(1):
                vs, cs_ = [], []
                for j in range(3):
                    ia = a
                    ib = oth[:, j]
                    sa = sm[np.arange(len(a)), ia]
                    sb = sm[np.arange(len(a)), ib]
                    tpar = sa / np.where(np.abs(sa - sb) < 1e-12, 1e-12,
                                         sa - sb)
                    tpar = np.clip(tpar, 0, 1)[:, None]
                    vs.append(pm[np.arange(len(a)), ia]
                              + tpar * (pm[np.arange(len(a)), ib]
                                        - pm[np.arange(len(a)), ia]))
                    cs_.append(cm[np.arange(len(a)), ia]
                               + tpar * (cm[np.arange(len(a)), ib]
                                         - cm[np.arange(len(a)), ia]))
                verts.append(np.stack(vs, 1).reshape(-1, 3))
                cols.append(np.stack(cs_, 1).reshape(-1, 3))

        # two inside: quad -> 2 triangles
        m = count == 2
        if m.any():
            sm, pm, cm, nm = s[m], p[m], c[m], neg[m]
            K = sm.shape[0]
            # indices of the two negative (A,B) and two positive (C,D)
            order = np.argsort(~nm, axis=1, kind="stable")  # neg first
            A, B, C, D = order[:, 0], order[:, 1], order[:, 2], order[:, 3]
            ar = np.arange(K)

            def e(i, j):
                sa, sb = sm[ar, i], sm[ar, j]
                tpar = sa / np.where(np.abs(sa - sb) < 1e-12, 1e-12, sa - sb)
                tpar = np.clip(tpar, 0, 1)[:, None]
                return (pm[ar, i] + tpar * (pm[ar, j] - pm[ar, i]),
                        cm[ar, i] + tpar * (cm[ar, j] - cm[ar, i]))

            vac, cac = e(A, C)
            vad, cad = e(A, D)
            vbc, cbc = e(B, C)
            vbd, cbd = e(B, D)
            # triangles (AC, AD, BC) and (BC, AD, BD)
            verts.append(np.stack([vac, vad, vbc], 1).reshape(-1, 3))
            cols.append(np.stack([cac, cad, cbc], 1).reshape(-1, 3))
            verts.append(np.stack([vbc, vad, vbd], 1).reshape(-1, 3))
            cols.append(np.stack([cbc, cad, cbd], 1).reshape(-1, 3))

    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.concatenate(verts), np.concatenate(cols)


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             colors: np.ndarray = None):
    """Write an OBJ with optional per-vertex colors (the reference writes
    mesh.obj via an atomic rename, main_tandem_pangolin.cpp:296-303)."""
    tmp = path + ".incomplete"
    with open(tmp, "w") as f:
        if colors is not None and len(colors) == len(vertices):
            for v, c in zip(vertices, colors):
                f.write(f"v {v[0]} {v[1]} {v[2]} "
                        f"{c[0] / 255:.4f} {c[1] / 255:.4f} {c[2] / 255:.4f}\n")
        else:
            for v in vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")
    import os
    os.replace(tmp, path)
