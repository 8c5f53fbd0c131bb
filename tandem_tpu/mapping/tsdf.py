"""TSDF fusion on TPU: block-paged dense voxel grid + sphere-traced raycast.

TPU-native re-design of the reference's voxel-hashing volume
(tandem/libdr/dr_fusion/src/tsdfvh/): the GPU hash table + heap free-list
(hash_table.cu:81-115, heap.cu:15-33) becomes a dense int32 page table over
quantized block coordinates plus a flat voxel pool — pointer chasing becomes
array indexing, atomicCAS allocation becomes a cumsum prefix over the
touched-block mask, and every kernel is a fixed-shape vectorized XLA program.

Behavioural parity notes (tsdf_volume.cu):
- integrate (IntegrateScanKernel:436-513): per-voxel nearest-pixel projection
  (round), euclidean ray distances, weighted sdf/color average with weight
  clamp (voxel.h Combine), truncation-band update sdf = surface - voxel_dist,
  free-space update sdf = +truncation.
- allocation (AllocateFromDepthKernel:317-434) traverses camera->surface rays;
  here only the truncation band around the surface is allocated. Free-space
  blocks that never see a surface would only ever hold sdf=+truncation, which
  renders identically to unallocated space (both advance the ray by the
  truncation distance), so the visible behaviour matches while allocation
  stays O(pixels).
- raycast (GenerateRgbDepthKernel:600-632): march along each pixel ray
  advancing by the interpolated sdf (or truncation where unknown) until
  sdf < voxel_size; trilinear voxel interpolation with centre-value fallback
  for empty corners (GetInterpolatedVoxel:161-).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class TsdfConfig:
    """Mirrors DrFusionOptions (FullSystem.cpp:259-276): 1 cm voxels, 8^3
    blocks, 4 cm truncation, max weight 64."""
    voxel_size: float = 0.01
    block_size: int = 8
    table_dim: int = 160           # blocks per axis; arena = dim*block*voxel m
    pool_size: int = 1 << 16       # current pool capacity in blocks
    # Growth ceiling for grow_volume (the reference commits 10^6 blocks up
    # front and KERNEL_ABORTs on heap exhaustion, heap.cu:16-18 /
    # FullSystem.cpp:259-276; here the pool starts small and doubles on
    # demand — each block costs ~10 KB of HBM, so 2^18 = 2.7 GB max).
    pool_max: int = 1 << 18
    truncation: float = 0.04
    max_weight: float = 64.0
    min_depth: float = 0.1
    max_depth: float = 10.0
    image_width: int = 640         # set per-call by integrate()
    # Band-sampling pixel stride for allocate_blocks (see its docstring):
    # 2 halves the alloc sort cost; every block footprint is still sampled
    # multiple times (>= 3 px across even at max_depth).
    alloc_stride: int = 2

    @property
    def block_extent(self) -> float:
        return self.voxel_size * self.block_size


class TsdfVolume(struct.PyTreeNode):
    """Block-paged TSDF volume state.

    LINEAR TYPE — consume on update. ``allocate_blocks``, ``integrate`` and
    ``integrate_culled`` DONATE the input volume's buffers to the update (the
    pool arrays are hundreds of MB; donation is what makes chunked in-place
    updates O(chunk) instead of O(pool) copies). After
    ``vol2 = integrate(cfg, vol, ...)`` the old ``vol`` is DELETED — never
    reuse it. To branch (e.g. compare two update paths from one state), take
    an explicit ``copy_volume(vol)`` first. Read-only consumers
    (``visible_slots``, ``render_depth_splat``, ``raycast``,
    ``extract_mesh``) do not consume.
    """
    page_table: jnp.ndarray    # (T^3,) int32, -1 = unallocated
    block_coords: jnp.ndarray  # (pool, 3) int32 signed block coordinates
    tsdf: jnp.ndarray          # (pool, 512) float32
    weight: jnp.ndarray        # (pool, 512) float32
    color: jnp.ndarray         # (pool, 512, 3) float32 [0, 255]
    n_allocated: jnp.ndarray   # () int32
    n_dropped: jnp.ndarray     # () int32, cumulative pool-full alloc drops


def copy_volume(vol: TsdfVolume) -> TsdfVolume:
    """Deep-copy a volume so one state can feed two donating updates."""
    return jax.tree.map(jnp.copy, vol)


def grow_volume(cfg: TsdfConfig, vol: TsdfVolume,
                factor: int = 2) -> Tuple[TsdfConfig, TsdfVolume]:
    """Double the block pool (host-driven, between keyframes). Pool slots are
    stable indices, so growth is pure zero-padding of the pool arrays — the
    page table is untouched. allocate_blocks is idempotent, so the caller
    re-runs it on the same scan after growing to pick up the blocks that
    were dropped (see TandemBackend). Doubling recompiles the chunked
    integrate/splat programs once per new size; pool_max caps the spiral."""
    new_pool = min(cfg.pool_size * factor, cfg.pool_max)
    if new_pool == cfg.pool_size:
        return cfg, vol
    pad = new_pool - cfg.pool_size
    return (dataclasses.replace(cfg, pool_size=new_pool),
            vol.replace(
                block_coords=jnp.concatenate(
                    [vol.block_coords, jnp.zeros((pad, 3), jnp.int32)]),
                tsdf=jnp.concatenate(
                    [vol.tsdf, jnp.zeros((pad,) + vol.tsdf.shape[1:])]),
                weight=jnp.concatenate(
                    [vol.weight, jnp.zeros((pad,) + vol.weight.shape[1:])]),
                color=jnp.concatenate(
                    [vol.color, jnp.zeros((pad,) + vol.color.shape[1:])])))


def create_volume(cfg: TsdfConfig) -> TsdfVolume:
    p, b3 = cfg.pool_size, cfg.block_size ** 3
    return TsdfVolume(
        page_table=jnp.full((cfg.table_dim ** 3,), -1, jnp.int32),
        block_coords=jnp.zeros((p, 3), jnp.int32),
        tsdf=jnp.zeros((p, b3), jnp.float32),
        weight=jnp.zeros((p, b3), jnp.float32),
        color=jnp.zeros((p, b3, 3), jnp.float32),
        n_allocated=jnp.zeros((), jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )


def _table_index(cfg: TsdfConfig, block: jnp.ndarray):
    """block: (..., 3) signed int -> flat table index + validity mask."""
    T = cfg.table_dim
    shifted = block + T // 2
    valid = jnp.all((shifted >= 0) & (shifted < T), axis=-1)
    sx = jnp.clip(shifted, 0, T - 1)
    flat = (sx[..., 0] * T + sx[..., 1]) * T + sx[..., 2]
    return flat, valid


def _unproject(u, v, depth, K):
    """Integer-pixel z-depth unprojection (utils.h GetPoint3d:93-101)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u.astype(jnp.float32) - cx) * depth / fx
    y = (v.astype(jnp.float32) - cy) * depth / fy
    return jnp.stack([x, y, depth], -1)


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(1,))
def allocate_blocks(cfg: TsdfConfig, vol: TsdfVolume, depth, K, cam_to_world,
                    stride: int = None):
    """Allocate pool blocks for the truncation band around the depth surface.

    :param depth: (H, W) metric depth, 0 = invalid
    :param K: (3, 3); cam_to_world: (4, 4)
    :param stride: pixel subsampling of the band sampling grid (default
        cfg.alloc_stride). The alloc cost is the 5*H*W/stride^2-key
        sort-dedup; a block's image footprint is >= 3 px across even at
        max_depth (8 cm * fx/10 m), so stride=2 still samples every block
        footprint multiple times. stride=1 is the exhaustive reference
        behaviour.
    """
    if stride is None:
        stride = cfg.alloc_stride
    H, W = depth.shape
    d = depth[::stride, ::stride].reshape(-1)
    valid = (d >= cfg.min_depth) & (d <= cfg.max_depth)
    Ws = -(-W // stride)
    Hs = -(-H // stride)

    u = jnp.tile(jnp.arange(0, W, stride, dtype=jnp.float32), Hs)
    v = jnp.repeat(jnp.arange(0, H, stride, dtype=jnp.float32), Ws)

    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]

    # Band samples: half a block apart through [d - trunc, d + trunc].
    n_samp = 5
    offsets = jnp.linspace(-cfg.truncation, cfg.truncation, n_samp)
    blocks = []
    block_valid = []
    for off in offsets:
        pts_cam = _unproject(u, v, d + off, K)  # (HW, 3)
        pts_w = pts_cam @ R.T + t
        blk = jnp.floor(pts_w / cfg.block_extent).astype(jnp.int32)
        blocks.append(blk)
        block_valid.append(valid)
    blocks = jnp.concatenate(blocks)            # (n*HW, 3)
    bvalid = jnp.concatenate(block_valid)

    flat, in_arena = _table_index(cfg, blocks)
    T3 = cfg.table_dim ** 3

    # Sort-dedup-first design (round-4 rewrite). The natural formulation —
    # scatter `touched` over the 4M-entry table, then per-sample gathers of
    # the table — costs ~55 ms/KF on v5e: TPU scatters/gathers pay a
    # per-ROW cost (~7-10 ns into a 16 MB table, experiments/
    # bench_fusion_breakdown.py) and the sample set is 1.5M rows while the
    # information content is only ~5-10k unique blocks. A 1.5M-key sort is
    # ~2 ms on the same chip, so: sort the flat block ids, mark first
    # occurrences, compact the unique ids to the front with a second sort,
    # and do ALL table reads/writes on the 64k-row compacted set. Block
    # coordinates are DECODED from the table index arithmetically — no
    # gather at all. Measured 69.6 -> ~6 ms (docs/PERF.md).
    key = jnp.where(bvalid & in_arena, flat, T3)
    s = jnp.sort(key)
    first = jnp.concatenate(
        [s[:1] < T3, (s[1:] != s[:-1]) & (s[1:] < T3)])
    n_first_total = jnp.sum(first.astype(jnp.int32))

    # Compact unique ids to the front. U bounds the NEW blocks one scan can
    # introduce (16k blocks = ~105 m^2 of fresh surface in ONE frame; the
    # densest first-frame fixture allocates ~5.5k) and sizes the table
    # gather + two pool scatters below. Overflow is counted into n_dropped
    # (conservatively: overflow uniques are counted as wanted even if some
    # were already allocated), and the caller's grow/re-alloc loop re-runs
    # allocate_blocks, which is idempotent and picks up U more each pass.
    U = min(cfg.pool_size, 1 << 14)
    uniq = jnp.sort(jnp.where(first, s, T3))[:U]
    valid_u = uniq < T3

    old = vol.page_table[jnp.clip(uniq, 0, T3 - 1)]     # U-row gather
    new = valid_u & (old < 0)
    order = jnp.cumsum(new.astype(jnp.int32))
    slot = vol.n_allocated + order - 1          # pool slot per new block
    can_alloc = new & (slot < cfg.pool_size)

    page_table = vol.page_table.at[
        jnp.where(can_alloc, uniq, T3)].set(slot, mode="drop")

    # Inverse map: decode signed block coords from the flat table index
    # (the exact inverse of _table_index) and scatter U rows into the pool.
    T = cfg.table_dim
    bc = (jnp.stack([uniq // (T * T), (uniq // T) % T, uniq % T], -1)
          .astype(jnp.int32) - T // 2)
    block_coords = vol.block_coords.at[
        jnp.where(can_alloc, slot, cfg.pool_size)].set(bc, mode="drop")

    n_new = jnp.sum(can_alloc.astype(jnp.int32))
    n_want = jnp.sum(new.astype(jnp.int32)) + jnp.maximum(
        n_first_total - U, 0)
    return vol.replace(page_table=page_table, block_coords=block_coords,
                       n_allocated=vol.n_allocated + n_new,
                       n_dropped=vol.n_dropped + (n_want - n_new))


@partial(jax.jit, static_argnums=(0, 7), donate_argnums=(1,))
def _integrate_chunk(cfg: TsdfConfig, vol: TsdfVolume, depth_color, K,
                     w2c_R, w2c_t, start, chunk: int):
    """Fuse one scan into ``chunk`` pool blocks beginning at slot ``start``.

    depth_color: (H*W, 4) packed [depth, r, g, b] — one wide-row gather
    serves depth and color together (narrow gathers are the TPU killer).
    """
    HW = depth_color.shape[0]
    b = cfg.block_size
    B3 = b ** 3

    coords = jax.lax.dynamic_slice_in_dim(vol.block_coords, start, chunk, 0)
    tsdf_c = jax.lax.dynamic_slice_in_dim(vol.tsdf, start, chunk, 0)
    weight_c = jax.lax.dynamic_slice_in_dim(vol.weight, start, chunk, 0)
    color_c = jax.lax.dynamic_slice_in_dim(vol.color, start, chunk, 0)

    # Component-wise position math on (C, B3) tiles: a trailing size-3 xyz
    # axis sits on the 128-lane dimension at 3/128 occupancy (same lesson as
    # the plane-sweep warp's HLO).
    li = jnp.arange(B3, dtype=jnp.int32)
    lx = (li % b).astype(jnp.float32)
    ly = ((li // b) % b).astype(jnp.float32)
    lz = (li // (b * b)).astype(jnp.float32)
    base = coords.astype(jnp.float32) * b               # (C, 3)
    vs = cfg.voxel_size
    wx = (base[:, 0:1] + lx[None]) * vs                 # (C, B3)
    wy = (base[:, 1:2] + ly[None]) * vs
    wz = (base[:, 2:3] + lz[None]) * vs
    xc = w2c_R[0, 0] * wx + w2c_R[0, 1] * wy + w2c_R[0, 2] * wz + w2c_t[0]
    yc = w2c_R[1, 0] * wx + w2c_R[1, 1] * wy + w2c_R[1, 2] * wz + w2c_t[1]
    z = w2c_R[2, 0] * wx + w2c_R[2, 1] * wy + w2c_R[2, 2] * wz + w2c_t[2]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    img_w = cfg.image_width
    img_h = HW // img_w
    z_safe = jnp.where(z <= 1e-6, 1.0, z)
    u = jnp.round(fx * xc / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * yc / z_safe + cy).astype(jnp.int32)
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)

    slot_active = ((start + jnp.arange(chunk)) < vol.n_allocated)[:, None]

    pix = jnp.where(in_img, v * img_w + u, 0).reshape(-1)
    # Wide-row gather of the f16x8 split-precision pack (see _pack_scan).
    dc = depth_color[pix].reshape(chunk, B3, 8)
    d_px = dc[..., 0].astype(jnp.float32) + dc[..., 1].astype(jnp.float32)
    c_px = dc[..., 2:5].astype(jnp.float32)
    d_ok = (d_px > 0) & (d_px >= cfg.min_depth) & (d_px < cfg.max_depth)

    # surface_dist = |unproject(u, v, d)| (utils.h GetPoint3d:93-101) =
    # d * ray_norm; the per-pixel ray norm rides lanes 5-6 of the gathered
    # row (split-precision, see _pack_scan) instead of a per-voxel sqrt.
    ray_norm = dc[..., 5].astype(jnp.float32) + dc[..., 6].astype(
        jnp.float32)
    surface_dist = d_px * ray_norm
    voxel_dist = jnp.sqrt(xc * xc + yc * yc + z * z)

    in_band = (voxel_dist > surface_dist - cfg.truncation) & \
              (voxel_dist < surface_dist + cfg.truncation)
    in_free = voxel_dist < surface_dist - cfg.truncation
    update = slot_active & in_img & d_ok & (in_band | in_free)
    sdf_new = jnp.where(in_band, surface_dist - voxel_dist, cfg.truncation)

    denom = weight_c + 1.0
    tsdf_n = jnp.where(update, (tsdf_c * weight_c + sdf_new) / denom, tsdf_c)
    color_n = jnp.where(update[..., None],
                        (color_c * weight_c[..., None] + c_px)
                        / denom[..., None], color_c)
    weight_n = jnp.where(update, jnp.minimum(denom, cfg.max_weight), weight_c)

    return vol.replace(
        tsdf=jax.lax.dynamic_update_slice_in_dim(vol.tsdf, tsdf_n, start, 0),
        weight=jax.lax.dynamic_update_slice_in_dim(vol.weight, weight_n,
                                                   start, 0),
        color=jax.lax.dynamic_update_slice_in_dim(vol.color, color_n,
                                                  start, 0))


@jax.jit
def _pack_scan(depth, color, cam_to_world, K):
    """Pack the scan as (H*W, 8) f16 rows [d_hi, d_lo, r, g, b, n_hi, n_lo,
    0].

    The per-voxel pixel lookup is a 3.1 M-row gather and the TPU gather
    unit moves f16x8 rows ~4x faster than the f32x4 packing it replaces
    (measured 3.4 vs 13.6 ms for 6144 blocks on v5e — see docs/PERF.md
    round 4). Depth is split-precision: d_hi = f16(d), d_lo = f16(d - d_hi),
    reconstructed as f32(d_hi) + f32(d_lo) with relative error ~2^-21
    (<1 um at 2 m — far below the 1 cm voxel). Colors are 0..255 integers,
    exact in f16 (10 mantissa bits cover integers to 2048). Lanes 5-6 carry
    the per-pixel ray norm |K^-1 (u, v, 1)| split-precision: one sqrt per
    PIXEL here replaces a sqrt + 4-op chain per VOXEL (3.1 M/KF) in the
    integrate kernels.
    """
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ru = (jnp.arange(W, dtype=jnp.float32)[None, :] - cx) / fx
    rv = (jnp.arange(H, dtype=jnp.float32)[:, None] - cy) / fy
    norm = jnp.sqrt(ru * ru + rv * rv + 1.0).reshape(-1, 1)
    n_hi = norm.astype(jnp.float16)
    n_lo = (norm - n_hi.astype(jnp.float32)).astype(jnp.float16)
    d = depth.reshape(-1, 1)
    d_hi = d.astype(jnp.float16)
    d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.float16)
    depth_color = jnp.concatenate(
        [d_hi, d_lo, color.reshape(-1, 3).astype(jnp.float16), n_hi, n_lo,
         jnp.zeros((d.shape[0], 1), jnp.float16)], -1)
    w2c_R = cam_to_world[:3, :3].T
    w2c_t = -w2c_R @ cam_to_world[:3, 3]
    return depth_color, w2c_R, w2c_t


def integrate(cfg: TsdfConfig, vol: TsdfVolume, depth, color, K, cam_to_world,
              chunk: int = None, n_allocated: int = None):
    """Fuse one (depth, color) scan into the volume.

    Host-driven chunking over ALLOCATED blocks only (the reference likewise
    iterates over live hash entries, IntegrateScanKernel:436-); each chunk is
    a fixed-shape jitted update so the cost scales with the active surface,
    not the pool capacity.

    :param depth: (H, W); color: (H, W, 3) float [0,255] RGB; K: (3,3)
    :param n_allocated: host-known allocation count; pass it to avoid a
        blocking device sync (int(vol.n_allocated)) on the dispatch path
    """
    H, W = depth.shape
    cfg = dataclasses.replace(cfg, image_width=W)
    depth_color, w2c_R, w2c_t = _pack_scan(depth, color, cam_to_world, K)
    n = int(vol.n_allocated) if n_allocated is None else n_allocated
    if chunk is None:
        # Auto: one launch sized to the allocation (program invocations
        # carry ~1.5 ms fixed cost each on TPU — bench_scatter_fixed.py);
        # beyond the 8192-block step the pool is a power of two, so the
        # clamping dynamic_slice hazard cannot occur.
        chunk = _pad_sched(n, cfg.pool_size)
    chunk = min(chunk, cfg.pool_size)
    assert n <= chunk or cfg.pool_size % chunk == 0, \
        "chunk must divide pool_size when iterating"
    for start in range(0, max(n, 1), chunk):
        vol = _integrate_chunk(cfg, vol, depth_color, K, w2c_R, w2c_t,
                               start, chunk)
    return vol


@partial(jax.jit, static_argnums=(0, 4, 5))
def visible_slots(cfg: TsdfConfig, vol: TsdfVolume, K, cam_to_world,
                  height: int, width: int):
    """Frustum-cull the allocated blocks for one camera (the reference's
    IntegrateScanKernel per-entry frustum early-out, tsdf_volume.cu:436-):
    block centers projected with a conservative block-radius margin.

    :return: (slots, n_visible) — slots (pool_size,) int32 with the visible
        pool slots compacted to the front and cfg.pool_size (= drop
        sentinel) padding; n_visible () int32.

    Exactness: a culled integrate updates the same voxels as the full walk,
    PROVABLY, so integrate(slots=...) == integrate() always. Every voxel the
    integrate kernel can update has camera z_vox > 0, rounds into the image
    (u_f in [-0.5, W-0.5)), and lies within surface_dist + truncation <=
    max_depth*ray_norm + truncation of the camera. Blocks are kept if the
    bounding ball (radius r) around the center can contain such a voxel:

    - far plane: z - r < max_depth + truncation (voxel z_vox < d_px +
      truncation/ray_norm <= max_depth + truncation, and z <= z_vox + r);
    - image test with the exact first-order margin per axis
      m_u = (fx + |u-cx|) * r / (z - r): from u = fx*x/z + cx,
      |Δu| = fx|δx·z − x·δz| / (z(z+δz)) <= fx·r(z+|x|)/(z(z−r))
           = (fx + |u−cx|)·r/(z−r) for any |δ| <= r — this bound carries the
      obliquity term the naive fx·r/(z−r) margin misses;
    - near-camera rescue for blocks whose ball reaches the camera plane
      (z - r <= 0): any updatable voxel there has z_vox <= z + r and
      in-image, so its distance is <= (z+r)·ray_norm_max; keep if
      |center| <= (z+r)·ray_norm_max + r. Covers the camera-inside-geometry
      case for any FOV (tested adversarially in test_tsdf.py).
    """
    P = cfg.pool_size
    alloc = jnp.arange(P) < vol.n_allocated
    vis = alloc & _frustum_mask(cfg, K, cam_to_world, height, width,
                                vol.block_coords)

    rank = jnp.cumsum(vis.astype(jnp.int32)) - 1
    slots = jnp.full((P,), P, jnp.int32).at[
        jnp.where(vis, rank, P)].set(jnp.arange(P, dtype=jnp.int32),
                                     mode="drop")
    return slots, jnp.sum(vis.astype(jnp.int32))


def _frustum_mask(cfg: TsdfConfig, K, cam_to_world, height: int, width: int,
                  block_coords):
    """The conservative per-block frustum predicate of visible_slots (see
    its docstring for the proof), over an arbitrary (N, 3) coords array."""
    centers = (block_coords.astype(jnp.float32) + 0.5) * cfg.block_extent
    R = cam_to_world[:3, :3].T
    t = -R @ cam_to_world[:3, 3]
    cam = centers @ R.T + t                               # (N, 3)
    r = cfg.block_extent * (3.0 ** 0.5) / 2.0             # bounding radius
    z = cam[:, 2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z_safe = jnp.maximum(z, 1e-3)
    u = fx * cam[:, 0] / z_safe + cx
    v = fy * cam[:, 1] / z_safe + cy
    zr = jnp.maximum(z - r, 1e-3)
    m_u = (fx + jnp.abs(u - cx)) * r / zr
    m_v = (fy + jnp.abs(v - cy)) * r / zr
    in_depth = z - r < cfg.max_depth + cfg.truncation
    # integrate rounds: u_f in [-0.5, W-0.5) lands on a pixel.
    in_img = ((u + m_u >= -0.5) & (u - m_u <= width - 0.5)
              & (v + m_v >= -0.5) & (v - m_v <= height - 0.5))
    # ray_norm_max over the image: max |([-0.5,W-0.5]-cx)/fx| etc.
    tu = (jnp.maximum(cx, width - 1 - cx) + 0.5) / fx
    tv = (jnp.maximum(cy, height - 1 - cy) + 0.5) / fy
    norm_max = jnp.sqrt(1.0 + tu * tu + tv * tv)
    near = ((z - r <= 0) & (z + r > 0)
            & (jnp.sqrt(jnp.sum(cam * cam, -1))
               <= (z + r) * norm_max + r))
    return near | ((z - r > 0) & in_depth & in_img)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def surface_axis_slots(cfg: TsdfConfig, vol: TsdfVolume, K, cam_to_world,
                       height: int, width: int, n_pad: int):
    """Per-axis surface + frustum cull for the splat render camera.

    The splat emits one candidate row per (block, axis, column); measured on
    a realistic scan only ~22% of rows are valid, concentrated in few
    (block, axis) pairs (surfaces are locally planar — columns of the
    near-normal axis all cross, the other two axes mostly don't). Keeping a
    (block, axis) pair only when a crossing along that axis is POSSIBLE cuts
    both the candidate math and the scatter rows ~3x with a bit-exact
    result (test_splat_axis_culled_matches_full).

    A pair (B, a) can emit only if
      - some column of axis a in B holds valid voxels of both signs
        (superset of an adjacent-pair sign change), or
      - B and its +a neighbour hold valid voxels of opposite signs (superset
        of a face-straddling crossing recovered via pair_tab),
    and B's bounding ball intersects the view frustum (every emitted point
    lies in B's closed cube; _frustum_mask covers the ball).

    MUST run AFTER this keyframe's integrate — the flags read the fused sdf.

    :param n_pad: static padded allocation count (multiples of the chunk
        size keep jit signatures rare).
    :return: (slots3, counts3) — slots3 (3, pool_size) int32, per-axis
        visible surface slots compacted to the front with cfg.pool_size
        sentinel padding; counts3 (3,) int32.
    """
    b = cfg.block_size
    P = cfg.pool_size
    n_pad = min(n_pad, P)
    tsdf_p = jax.lax.slice_in_dim(vol.tsdf, 0, n_pad, axis=0)
    weight_p = jax.lax.slice_in_dim(vol.weight, 0, n_pad, axis=0)
    coords_p = jax.lax.slice_in_dim(vol.block_coords, 0, n_pad, axis=0)

    valid = weight_p > 0
    vp = valid & (tsdf_p >= 0)
    vn = valid & (tsdf_p <= 0)

    view = (n_pad, b, b, b)                               # (chunk, z, y, x)
    vp_v = vp.reshape(view)
    vn_v = vn.reshape(view)

    alloc = jnp.arange(n_pad) < vol.n_allocated
    vis = alloc & _frustum_mask(cfg, K, cam_to_world, height, width,
                                coords_p)

    slots3, counts3 = [], []
    # Per axis: the in-block column test, plus a COLUMN-exact face term (a
    # block-level has-both-signs test is useless in a truncation band —
    # nearly every band block holds both signs, so it kept ~80% of pairs;
    # matching last/first slice flags per column culls the tangent axes).
    for axis, dim, lp, ln, fp, fn in (
            (0, 3, vp_v[..., b - 1], vn_v[..., b - 1],
             vp_v[..., 0], vn_v[..., 0]),
            (1, 2, vp_v[:, :, b - 1, :], vn_v[:, :, b - 1, :],
             vp_v[:, :, 0, :], vn_v[:, :, 0, :]),
            (2, 1, vp_v[:, b - 1], vn_v[:, b - 1],
             vp_v[:, 0], vn_v[:, 0])):
        # Column-wise both-signs test along this axis (superset of an
        # adjacent crossing; an invalid gap between the signs keeps the
        # block — conservative, never wrong).
        col_cross = jnp.any(vp_v, axis=dim) & jnp.any(vn_v, axis=dim)
        flag = jnp.any(col_cross.reshape(n_pad, b * b), axis=1)
        # Face-straddling crossings: the +axis neighbour's first slice
        # holds the opposite sign in the SAME column as our last slice.
        nb_block = coords_p.at[:, axis].add(1)
        flat_tab, in_arena = _table_index(cfg, nb_block)
        nb_slot = vol.page_table[flat_tab]
        nb_ok = (nb_slot >= 0) & (nb_slot < n_pad) & in_arena
        safe = jnp.where(nb_ok, nb_slot, 0)
        fp_c = fp.reshape(n_pad, b * b)
        fn_c = fn.reshape(n_pad, b * b)
        lp_c = lp.reshape(n_pad, b * b)
        ln_c = ln.reshape(n_pad, b * b)
        face = jnp.any((lp_c & fn_c[safe]) | (ln_c & fp_c[safe]), axis=1)
        flag = flag | (nb_ok & face)
        keep = vis & flag
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slots3.append(jnp.full((P,), P, jnp.int32).at[
            jnp.where(keep, rank, P)].set(
                jnp.arange(n_pad, dtype=jnp.int32), mode="drop"))
        counts3.append(jnp.sum(keep.astype(jnp.int32)))
    return jnp.stack(slots3), jnp.stack(counts3)


@partial(jax.jit, static_argnums=(0, 7), donate_argnums=(1,))
def _integrate_chunk_gather(cfg: TsdfConfig, vol: TsdfVolume, depth_color, K,
                            w2c_R, w2c_t, slots, chunk: int):
    """_integrate_chunk over an explicit slot list (frustum-culled path):
    rows are gathered by slot and scattered back; sentinel slots (=
    pool_size) are dropped by the scatter."""
    HW = depth_color.shape[0]
    b = cfg.block_size
    B3 = b ** 3
    safe = jnp.clip(slots, 0, cfg.pool_size - 1)
    active = slots < cfg.pool_size

    coords = vol.block_coords[safe]
    tsdf_c = vol.tsdf[safe]
    weight_c = vol.weight[safe]
    color_c = vol.color[safe]

    li = jnp.arange(B3, dtype=jnp.int32)
    lx = (li % b).astype(jnp.float32)
    ly = ((li // b) % b).astype(jnp.float32)
    lz = (li // (b * b)).astype(jnp.float32)
    base = coords.astype(jnp.float32) * b
    vs = cfg.voxel_size
    wx = (base[:, 0:1] + lx[None]) * vs
    wy = (base[:, 1:2] + ly[None]) * vs
    wz = (base[:, 2:3] + lz[None]) * vs
    xc = w2c_R[0, 0] * wx + w2c_R[0, 1] * wy + w2c_R[0, 2] * wz + w2c_t[0]
    yc = w2c_R[1, 0] * wx + w2c_R[1, 1] * wy + w2c_R[1, 2] * wz + w2c_t[1]
    z = w2c_R[2, 0] * wx + w2c_R[2, 1] * wy + w2c_R[2, 2] * wz + w2c_t[2]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    img_w = cfg.image_width
    img_h = HW // img_w
    z_safe = jnp.where(z <= 1e-6, 1.0, z)
    u = jnp.round(fx * xc / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * yc / z_safe + cy).astype(jnp.int32)
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)

    pix = jnp.where(in_img, v * img_w + u, 0).reshape(-1)
    # Wide-row gather of the f16x8 split-precision pack (see _pack_scan).
    dc = depth_color[pix].reshape(chunk, B3, 8)
    d_px = dc[..., 0].astype(jnp.float32) + dc[..., 1].astype(jnp.float32)
    c_px = dc[..., 2:5].astype(jnp.float32)
    d_ok = (d_px > 0) & (d_px >= cfg.min_depth) & (d_px < cfg.max_depth)

    # Per-pixel ray norm from lanes 5-6 of the gathered row (_pack_scan).
    ray_norm = dc[..., 5].astype(jnp.float32) + dc[..., 6].astype(
        jnp.float32)
    surface_dist = d_px * ray_norm
    voxel_dist = jnp.sqrt(xc * xc + yc * yc + z * z)

    in_band = (voxel_dist > surface_dist - cfg.truncation) & \
              (voxel_dist < surface_dist + cfg.truncation)
    in_free = voxel_dist < surface_dist - cfg.truncation
    update = active[:, None] & in_img & d_ok & (in_band | in_free)
    sdf_new = jnp.where(in_band, surface_dist - voxel_dist, cfg.truncation)

    denom = weight_c + 1.0
    tsdf_n = jnp.where(update, (tsdf_c * weight_c + sdf_new) / denom, tsdf_c)
    color_n = jnp.where(update[..., None],
                        (color_c * weight_c[..., None] + c_px)
                        / denom[..., None], color_c)
    weight_n = jnp.where(update, jnp.minimum(denom, cfg.max_weight), weight_c)

    return vol.replace(
        tsdf=vol.tsdf.at[slots].set(tsdf_n, mode="drop"),
        weight=vol.weight.at[slots].set(weight_n, mode="drop"),
        color=vol.color.at[slots].set(color_n, mode="drop"))


def integrate_culled(cfg: TsdfConfig, vol: TsdfVolume, depth, color, K,
                     cam_to_world, slots, n_visible: int, chunk: int = None):
    """integrate() over a frustum-culled slot list from visible_slots():
    device cost scales with the VISIBLE surface instead of everything ever
    allocated (long sequences keep integrating at constant cost).

    :param n_visible: host-known visible count (int(n_vis) — fetch it
        alongside the allocation count, one bundled sync per keyframe)
    """
    H, W = depth.shape
    cfg = dataclasses.replace(cfg, image_width=W)
    depth_color, w2c_R, w2c_t = _pack_scan(depth, color, cam_to_world, K)
    if chunk is None:
        chunk = _pad_sched(n_visible, cfg.pool_size)   # one-launch default
    chunk = min(chunk, cfg.pool_size)
    # Pad with drop sentinels so the last dynamic_slice never clamps its
    # start backwards (a clamped slice would re-integrate earlier slots).
    slots = jnp.concatenate(
        [slots, jnp.full((chunk,), cfg.pool_size, jnp.int32)])
    for start in range(0, max(n_visible, 1), chunk):
        sl = jax.lax.dynamic_slice_in_dim(slots, start, chunk, 0)
        vol = _integrate_chunk_gather(cfg, vol, depth_color, K, w2c_R,
                                      w2c_t, sl, chunk)
    return vol


def _get_voxels(cfg: TsdfConfig, vol: TsdfVolume, pts_w):
    """Lookup (sdf, weight, color) at world points. pts_w: (N, 3) ->
    sdf (N,), weight (N,), color (N, 3). Unallocated -> weight 0."""
    b = cfg.block_size
    vox = jnp.floor(pts_w / cfg.voxel_size).astype(jnp.int32)
    block = jnp.floor(pts_w / cfg.block_extent).astype(jnp.int32)
    local = vox - block * b
    local = jnp.clip(local, 0, b - 1)
    flat_tab, in_arena = _table_index(cfg, block)
    slot = vol.page_table[flat_tab]                      # (N,)
    allocated = (slot >= 0) & in_arena
    slot_safe = jnp.where(allocated, slot, 0)
    li = (local[:, 2] * b + local[:, 1]) * b + local[:, 0]
    sdf = vol.tsdf[slot_safe, li]
    w = jnp.where(allocated, vol.weight[slot_safe, li], 0.0)
    col = vol.color[slot_safe, li]
    return sdf, w, col


def _get_interpolated(cfg: TsdfConfig, vol: TsdfVolume, pts_w):
    """Trilinear interpolation with centre fallback
    (GetInterpolatedVoxel, tsdf_volume.cu:161-)."""
    vs = cfg.voxel_size
    sdf0, w0, col0 = _get_voxels(cfg, vol, pts_w)

    frac = pts_w / vs - jnp.floor(pts_w / vs)            # (N, 3)
    dual = pts_w - 0.5 * vs

    sdf_acc = jnp.zeros_like(sdf0)
    col_acc = jnp.zeros_like(col0)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                off = jnp.array([ox, oy, oz], jnp.float32) * vs
                s, w, c = _get_voxels(cfg, vol, dual + off)
                use = w > 0
                s = jnp.where(use, s, sdf0)
                c = jnp.where(use[:, None], c, col0)
                wt = (jnp.where(ox, frac[:, 0], 1 - frac[:, 0])
                      * jnp.where(oy, frac[:, 1], 1 - frac[:, 1])
                      * jnp.where(oz, frac[:, 2], 1 - frac[:, 2]))
                sdf_acc = sdf_acc + wt * s
                col_acc = col_acc + wt[:, None] * c
    # Centre weight==0 -> empty voxel result (weight 0, sdf 0).
    return (jnp.where(w0 > 0, sdf_acc, 0.0), w0,
            jnp.where(w0[:, None] > 0, col_acc, 0.0))


@partial(jax.jit, static_argnums=(0, 8, 9, 10), donate_argnums=(1,))
def _splat_chunk(cfg: TsdfConfig, zbuf, vol: TsdfVolume, pair_tab, K, w2c_R,
                 w2c_t, start, chunk: int, H: int, W: int):
    """Splat a contiguous pool range [start, start+chunk) (see _splat_core)."""
    coords = jax.lax.dynamic_slice_in_dim(vol.block_coords, start, chunk, 0)
    tsdf_c = jax.lax.dynamic_slice_in_dim(vol.tsdf, start, chunk, 0)
    weight_c = jax.lax.dynamic_slice_in_dim(vol.weight, start, chunk, 0)
    slot_active = ((start + jnp.arange(chunk)) < vol.n_allocated)
    return _splat_core(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t, coords,
                       tsdf_c, weight_c, slot_active, chunk, H, W)


@partial(jax.jit, static_argnums=(0, 8, 9, 10), donate_argnums=(1,))
def _splat_chunk_gather(cfg: TsdfConfig, zbuf, vol: TsdfVolume, pair_tab, K,
                        w2c_R, w2c_t, slots, chunk: int, H: int, W: int):
    """Splat an explicit (frustum-culled) slot list. Unlike the culled
    INTEGRATE, the splat is read-only — no payload scatter-back — so the
    per-block row gather is the only indirection cost and the culled path
    is cheaper whenever any block is out of view (sentinel slots ==
    pool_size are masked out)."""
    safe = jnp.clip(slots, 0, cfg.pool_size - 1)
    active = slots < cfg.pool_size
    coords = vol.block_coords[safe]
    tsdf_c = vol.tsdf[safe]
    weight_c = vol.weight[safe]
    return _splat_core(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t, coords,
                       tsdf_c, weight_c, active, chunk, H, W)


def _splat_axis_candidates(cfg: TsdfConfig, vol: TsdfVolume, pair_tab, K,
                           w2c_R, w2c_t, coords, tsdf_c, weight_c,
                           slot_active, chunk: int, H: int, W: int,
                           axis: int):
    """Candidate surface points of ``chunk`` blocks along ONE world axis.

    Per block column of ``axis``, the sdf sign change between adjacent
    voxels is located exactly (linear interpolation) and ONE surface point —
    the nearest-to-camera valid crossing — is emitted: 64 scatter rows per
    (block, axis). Crossings that straddle a block face are recovered from
    the +axis neighbour's first voxel slice via ``pair_tab`` ((P*B3, 8)
    f16 [sdf_hi, sdf_lo, weight, ...] prefix rows).

    :return: (flat, z) — (chunk*b*b,) scatter rows (flat == H*W sentinel
        where no valid crossing exists in the column).
    """
    b = cfg.block_size
    B3 = b ** 3
    vs = cfg.voxel_size
    P = pair_tab.shape[0] // B3

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    jk = jnp.arange(b * b, dtype=jnp.int32)
    o1, o2 = jk // b, jk % b

    # Per-voxel local coordinates as flat (B3,) constants: all the heavy
    # candidate math stays in the native (chunk, 512) layout — full
    # (8, 128) VPU tiles — instead of (..., 8, 8) views at 8/128-lane
    # occupancy (measured 26 ms/frame; the scatter itself is only ~5 ms).
    li = jnp.arange(B3, dtype=jnp.int32)
    lx = (li % b).astype(jnp.float32)
    ly = ((li // b) % b).astype(jnp.float32)
    lz = (li // (b * b)).astype(jnp.float32)
    base = coords.astype(jnp.float32) * b                      # (C, 3)
    active512 = slot_active[:, None]

    # world axis a; tensor dim of that axis in (chunk, z, y, x) views used
    # only for the +1 shift; the li of the neighbour block's coordinate-0
    # face at (o1, o2); the flat local coordinates of the two non-a axes.
    a, dim, face_li, l_o1, l_o2, col_o1, col_o2 = (
        (0, 3, o1 * (b * b) + o2 * b, lz, ly, 2, 1),   # x gaps
        (1, 2, o1 * (b * b) + o2, lz, lx, 2, 0),       # y gaps
        (2, 1, o1 * b + o2, ly, lx, 1, 0))[axis]       # z gaps
    la = (lx, ly, lz)[a]

    # Neighbour block's first slice along +a closes the inter-block gap.
    nb_block = coords.at[:, a].add(1)
    flat_tab, in_arena = _table_index(cfg, nb_block)
    nb_slot = vol.page_table[flat_tab]
    nb_ok = (nb_slot >= 0) & (nb_slot < P) & in_arena
    rows = (jnp.where(nb_ok, nb_slot, 0)[:, None] * B3 + face_li[None])
    nb = pair_tab[rows.reshape(-1)].reshape(chunk, b * b, 8)
    s_nb = (nb[..., 0].astype(jnp.float32)
            + nb[..., 1].astype(jnp.float32))              # (C, 64)
    w_nb = jnp.where(nb_ok[:, None], nb[..., 2].astype(jnp.float32), 0.0)

    # Value at local+1 along a (neighbour face at the boundary), built
    # with one slice+concat in the (chunk, ..., b, ...) view, then
    # flattened back to (C, B3) for ALL arithmetic.
    view = (chunk,) + (b,) * 3
    sA = tsdf_c.reshape(view)
    wA = weight_c.reshape(view)
    sl = [slice(None)] * 4
    sl[dim] = slice(1, None)
    fshape = [chunk, b, b, b]
    fshape[dim] = 1
    s1 = jnp.concatenate(
        [sA[tuple(sl)], s_nb.reshape(fshape)], dim).reshape(chunk, B3)
    w1 = jnp.concatenate(
        [wA[tuple(sl)], w_nb.reshape(fshape)], dim).reshape(chunk, B3)
    s0, w0 = tsdf_c, weight_c

    valid = ((w0 > 0) & (w1 > 0) & (s0 * s1 <= 0)
             & ~((s0 == 0) & (s1 == 0)))
    denom = s0 - s1
    t = jnp.clip(s0 / jnp.where(jnp.abs(denom) < 1e-20, 1.0, denom),
                 0.0, 1.0)

    # Camera z of each candidate is affine in (l_a + t): one fused pass
    # on (C, B3) with (B3,) coordinate-constant broadcasts.
    zc = ((w2c_R[2, col_o1] * (base[:, col_o1, None] + l_o1[None])
           + w2c_R[2, col_o2] * (base[:, col_o2, None] + l_o2[None])
           + w2c_R[2, a] * (base[:, a, None] + la[None] + t)) * vs
          + w2c_t[2])
    zc = jnp.where(valid & active512, zc, jnp.inf)

    # Nearest-to-camera crossing per column of axis a.
    red = zc.reshape(view)
    gmin = jnp.argmin(red, axis=dim)                       # (C, b, b)
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

    # Selected surface point in world voxel units -> camera u, v.
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
    return (jnp.where(ok, v * W + u, H * W).reshape(-1),
            jnp.where(ok, z_out, jnp.inf).reshape(-1))


def _splat_core(cfg: TsdfConfig, zbuf, vol: TsdfVolume, pair_tab, K, w2c_R,
                w2c_t, coords, tsdf_c, weight_c, slot_active, chunk: int,
                H: int, W: int):
    """Splat the zero-crossing surface points of ``chunk`` pool blocks:
    3 x 64 = 192 scatter rows per block instead of the 512 of a per-voxel
    shell splat (the scatter-min is ~40% of the splat cost on TPU, measured
    147 M rows/s), and the emitted points sit ON the surface instead of up
    to 1.5 voxels off. See _splat_axis_candidates for the per-axis math."""
    flats, zs = [], []
    for axis in range(3):
        f, z = _splat_axis_candidates(cfg, vol, pair_tab, K, w2c_R, w2c_t,
                                      coords, tsdf_c, weight_c, slot_active,
                                      chunk, H, W, axis)
        flats.append(f)
        zs.append(z)
    flat = jnp.concatenate(flats)
    zval = jnp.concatenate(zs)
    return zbuf.at[flat].min(zval, mode="drop")


@partial(jax.jit, static_argnums=(0, 1))
def _gather_block_rows(cfg: TsdfConfig, n_pad: int, vol: TsdfVolume, slots):
    """Compact (tsdf, weight, coords, active) rows for the first ``n_pad``
    entries of a sentinel-padded slot list in ONE dedicated gather program:
    a 6144-row pool gather costs 0.36 ms as its own program vs ~1 ms/chunk
    mixed into the splat programs (experiments/bench_slot_gather.py)."""
    sl = jax.lax.dynamic_slice_in_dim(slots, 0, n_pad, 0)
    safe = jnp.clip(sl, 0, cfg.pool_size - 1)
    return (vol.tsdf[safe], vol.weight[safe], vol.block_coords[safe],
            sl < cfg.pool_size)


def _pad_sched(n: int, pool_size: int) -> int:
    """Static padded size for the per-axis splat programs: fine 2048 steps
    while small, 8192 steps beyond (bounds jit-variant count over a growing
    pool at <=16% padded-compute waste)."""
    m = 2048 if n <= 8192 else 8192
    return min(-(-max(n, 1) // m) * m, pool_size)


@partial(jax.jit, static_argnums=(0, 8, 9, 10, 11, 12), donate_argnums=(1,))
def _splat_axis_prog(cfg: TsdfConfig, zbuf, vol: TsdfVolume, pair_tab, K,
                     w2c_R, w2c_t, rows, start: int, n_rows: int, H: int,
                     W: int, axis: int):
    """Single-axis splat over the [start, start + n_rows) slice of
    pre-gathered (surface-culled) block rows in ONE program: candidates +
    their scatter fused. Scatter-bearing programs carry ~1.5 ms fixed cost
    per invocation (experiments/bench_scatter_fixed.py), so the first
    chunked design was bound by program count; the interleaved A/B/C probe
    (experiments/bench_splat_ab.py) picked 3 per-axis programs (median
    10.95 ms) over one merged pad-to-max program (12.09) and the full
    3-chunk walk (15.65) at 5.3k blocks."""
    tsdf_s, weight_s, coords_s, active_s = rows
    sl = slice(start, start + n_rows)
    flat, zval = _splat_axis_candidates(cfg, vol, pair_tab, K, w2c_R, w2c_t,
                                        coords_s[sl], tsdf_s[sl],
                                        weight_s[sl], active_s[sl],
                                        n_rows, H, W, axis)
    return zbuf.at[flat].min(zval, mode="drop")


def _pair_table(vol: TsdfVolume, n: int, chunk: int):
    """(P*B3, 8) float16 [sdf_hi, sdf_lo, weight, 0 x5] prefix rows for
    cross-block lookups, with P rounded to the chunk size so jit signatures
    stay rare. Split-precision sdf (hi + lo reconstructs to ~2^-21 relative)
    and f16x8 rows because the TPU gather unit moves them ~4x faster than
    f32x2 at equal row count (docs/PERF.md round 4); weights are integer
    counts <= max_weight, exact in f16."""
    P = min(-(-max(n, 1) // chunk) * chunk, vol.tsdf.shape[0])
    return _pair_table_jit(P, vol)


@partial(jax.jit, static_argnums=(0,))
def _pair_table_jit(P: int, vol: TsdfVolume):
    B3 = vol.tsdf.shape[1]
    tsdf_p = jax.lax.slice_in_dim(vol.tsdf, 0, P, axis=0)
    wgt_p = jax.lax.slice_in_dim(vol.weight, 0, P, axis=0)
    s_hi = tsdf_p.astype(jnp.float16)
    s_lo = (tsdf_p - s_hi.astype(jnp.float32)).astype(jnp.float16)
    return jnp.stack(
        [s_hi, s_lo, wgt_p.astype(jnp.float16)]
        + [jnp.zeros_like(s_hi)] * 5, -1).reshape(P * B3, 8)


def render_depth_splat(cfg: TsdfConfig, vol: TsdfVolume, K, cam_to_world,
                       H: int, W: int, chunk: int = 2048,
                       fill_rounds: int = 2, n_allocated: int = None,
                       slots=None, n_visible: int = None,
                       axis_slots=None, axis_counts=None):
    """Render the model depth by splatting per-column sdf zero crossings with
    a z-buffer (occlusion = scatter-min) instead of per-ray sphere tracing.

    TPU-first replacement for the render path that feeds the coarse tracker
    (GenerateRgbDepthKernel): cost scales with the allocated surface, not
    rays x steps, and there are no sequential march loops. The splatted
    points are exact linear-interpolated surface crossings (see
    _splat_core); the tracker consumes the result as initialization-quality
    depth on a stride grid.

    :param slots: optional frustum-culled slot list for THIS camera (from
        visible_slots at cam_to_world) with host count ``n_visible``: splat
        cost then scales with the visible surface. Exact — out-of-frustum
        blocks cannot contribute to the z-buffer (their points project
        outside the image), which test_splat_culled_matches_full pins.
    :param axis_slots: optional (3, pool_size) per-axis surface-culled slot
        lists from surface_axis_slots with host counts ``axis_counts``
        (len-3): each axis then splats only the blocks that can cross along
        it — the fastest exact path (the backend uses this).
    :return: (H, W) depth, 0 where empty.
    """
    w2c_R, w2c_t, zbuf = _splat_init(cam_to_world, H, W)
    chunk = min(chunk, cfg.pool_size)
    n = int(vol.n_allocated) if n_allocated is None else n_allocated
    pair_tab = _pair_table(vol, n, chunk)
    if axis_slots is not None and axis_counts is not None:
        # Per-axis gather + compute programs, each sized to ITS culled
        # count. Both merge attempts lost in interleaved medians/minima
        # (bench_splat_ab.py): one merged COMPUTE program (variant B) and
        # one shared pad-to-max gather feeding sliced axis programs
        # (variant D) schedule worse than the simple per-axis structure.
        for axis in range(3):
            c = int(axis_counts[axis])
            if c == 0:
                continue
            c_pad = _pad_sched(c, cfg.pool_size)
            rows = _gather_block_rows(cfg, c_pad, vol, axis_slots[axis])
            zbuf = _splat_axis_prog(cfg, zbuf, vol, pair_tab, K, w2c_R,
                                    w2c_t, rows, 0, c_pad, H, W, axis)
    elif slots is not None and n_visible is not None:
        slots = jnp.concatenate(
            [slots, jnp.full((chunk,), cfg.pool_size, jnp.int32)])
        for start in range(0, max(n_visible, 1), chunk):
            sl = jax.lax.dynamic_slice_in_dim(slots, start, chunk, 0)
            zbuf = _splat_chunk_gather(cfg, zbuf, vol, pair_tab, K, w2c_R,
                                       w2c_t, sl, chunk, H, W)
    else:
        for start in range(0, max(n, 1), chunk):
            zbuf = _splat_chunk(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t,
                                start, chunk, H, W)
    return _splat_finish(zbuf, H, W, fill_rounds)


@partial(jax.jit, static_argnums=(1, 2))
def _splat_init(cam_to_world, H: int, W: int):
    w2c_R = cam_to_world[:3, :3].T
    w2c_t = -w2c_R @ cam_to_world[:3, 3]
    return w2c_R, w2c_t, jnp.full((H * W,), jnp.inf)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _splat_finish(zbuf, H: int, W: int, fill_rounds: int):
    depth = zbuf.reshape(H, W)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return _fill_holes(depth, rounds=fill_rounds)


@partial(jax.jit, static_argnums=(1,))
def _fill_holes(depth, rounds: int = 2):
    """Fill empty pixels from the 3x3 neighbourhood minimum (close-range
    voxel shells project sparsely)."""
    H, W = depth.shape
    for _ in range(rounds):
        p = jnp.pad(depth, 1, constant_values=jnp.inf)
        p = jnp.where(p > 0, p, jnp.inf)
        m = jnp.full((H, W), jnp.inf)
        for dy in range(3):
            for dx in range(3):
                m = jnp.minimum(m, p[dy:dy + H, dx:dx + W])
        depth = jnp.where(depth > 0, depth,
                          jnp.where(jnp.isfinite(m), m, 0.0))
    return depth


def raycast(cfg: TsdfConfig, vol: TsdfVolume, K_and_pose, H: int, W: int,
            chunk: int = 2048, n_allocated: int = None):
    """Render depth + color from a virtual camera by splat-seeded sphere
    tracing.

    TPU design: the reference marches EVERY ray from the camera in up to
    ~250 free-space steps (GenerateRgbDepthKernel, tsdf_volume.cu:600-632) —
    fine for divergent GPU warps, ruinous for lock-step vector hardware
    where every step is a full-width gather. Here a splat z-buffer over the
    allocated blocks (cost ~ surface area) seeds every covered ray to within
    ~a voxel of the surface; small z-buffer gaps (grazing surfaces project
    sparsely) are closed with a 3x3 min fill; the march is then a FIXED
    8-step sdf refinement across the truncation band with exact reference
    hit semantics (advance by sdf — or truncation where unknown — until
    sdf < voxel_size, depth includes the final step). Rays with no allocated
    geometry in their ~4-pixel neighbourhood render empty, which is also
    what the reference's free-space march returns for them. Voxel lookups
    gather ONE packed bf16 row [tsdf, weight, r, g, b] per sample (gather
    cost scales with row count, not width); hit color is one trilinear
    evaluation (GetInterpolatedVoxel parity, tsdf_volume.cu:161-).

    :param K_and_pose: (K (3,3), cam_to_world (4,4))
    :return: depth (H, W) float32 (0 where no hit), color (H, W, 3)
    """
    K, cam_to_world = K_and_pose
    w2c_R, w2c_t, zbuf = _splat_init(cam_to_world, H, W)
    chunk = min(chunk, cfg.pool_size)
    n = int(vol.n_allocated) if n_allocated is None else n_allocated
    pair_tab = _pair_table(vol, n, chunk)
    for start in range(0, max(n, 1), chunk):
        zbuf = _splat_chunk(cfg, zbuf, vol, pair_tab, K, w2c_R, w2c_t,
                            start, chunk, H, W)
    # Static allocated-prefix bound: TPU gather throughput cliffs ~5x once
    # the table exceeds the on-chip cache (~34 MB measured); bounding the
    # lookup tables by the allocated blocks (rounded, so recompiles are
    # rare) keeps every march/color gather on the fast path.
    n_pool = min(-(-max(n, 1) // 2048) * 2048, cfg.pool_size)
    return _raycast_march(cfg, vol, K, cam_to_world, zbuf, H, W,
                          n_pool=n_pool)


@partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9))
def _raycast_march(cfg: TsdfConfig, vol: TsdfVolume, K, cam_to_world, zbuf,
                   H: int, W: int, refine_steps: int = 5,
                   fill_rounds: int = 4, n_pool: int = None):
    N = H * W
    b = cfg.block_size
    u = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
    v = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # Component-wise ray directions: a trailing size-3 xyz axis would put
    # every position op on 3/128-lane tiles (same lesson as the warp).
    rcx = (u - cx) / fx
    rcy = (v - cy) / fy
    rwx = R[0, 0] * rcx + R[0, 1] * rcy + R[0, 2]
    rwy = R[1, 0] * rcx + R[1, 1] * rcy + R[1, 2]
    rwz = R[2, 0] * rcx + R[2, 1] * rcy + R[2, 2]
    tx, ty, tz = t[0], t[1], t[2]

    B3 = b ** 3
    P = vol.tsdf.shape[0] if n_pool is None else n_pool
    # Narrow per-purpose prefix tables (see raycast() on the cache cliff):
    # march reads [tsdf, weight] pairs, the color pass reads [r, g, b, w].
    # bf16 keeps ~0.4% relative sdf precision (< 2e-4 m in the truncation
    # band) and < 1 intensity unit of color error.
    tsdf_p = jax.lax.slice_in_dim(vol.tsdf, 0, P, axis=0)
    wgt_p = jax.lax.slice_in_dim(vol.weight, 0, P, axis=0)
    col_p = jax.lax.slice_in_dim(vol.color, 0, P, axis=0)
    march_tab = jnp.stack([tsdf_p, wgt_p], -1).astype(
        jnp.bfloat16).reshape(P * B3, 2)
    color_tab = jnp.concatenate(
        [col_p, wgt_p[..., None]], -1).astype(jnp.bfloat16).reshape(
            P * B3, 4)

    # The page table is 160^3 x int32 = 16 MB — past the ~34 MB gather cache
    # cliff once march+color tables join it in the working set. March slots
    # are bounded by P anyway, so gather from a P-clamped int16 copy (8 MB)
    # when P fits (it always does at the default 2048-block chunking).
    if P < 2 ** 15:
        page_tab = jnp.where(vol.page_table < P, vol.page_table,
                             -1).astype(jnp.int16)
    else:
        page_tab = vol.page_table

    T = cfg.table_dim

    def voxel_index(px, py, pz):
        """Component-wise voxel lookup at world position (px, py, pz)."""
        vx = jnp.floor(px / cfg.voxel_size).astype(jnp.int32)
        vy = jnp.floor(py / cfg.voxel_size).astype(jnp.int32)
        vz = jnp.floor(pz / cfg.voxel_size).astype(jnp.int32)
        bx = jnp.floor(px / cfg.block_extent).astype(jnp.int32)
        by = jnp.floor(py / cfg.block_extent).astype(jnp.int32)
        bz = jnp.floor(pz / cfg.block_extent).astype(jnp.int32)
        lx = jnp.clip(vx - bx * b, 0, b - 1)
        ly = jnp.clip(vy - by * b, 0, b - 1)
        lz = jnp.clip(vz - bz * b, 0, b - 1)
        # _table_index component-wise: flat = (sx*T + sy)*T + sz.
        sx, sy, sz = bx + T // 2, by + T // 2, bz + T // 2
        in_arena = ((sx >= 0) & (sx < T) & (sy >= 0) & (sy < T)
                    & (sz >= 0) & (sz < T))
        flat_tab = ((jnp.clip(sx, 0, T - 1) * T + jnp.clip(sy, 0, T - 1)) * T
                    + jnp.clip(sz, 0, T - 1))
        slot = page_tab[flat_tab].astype(jnp.int32)
        allocated = (slot >= 0) & (slot < P) & in_arena
        li = (lz * b + ly) * b + lx
        return jnp.where(allocated, slot, 0) * B3 + li, allocated

    def advance(cur, hit):
        idx, allocated = voxel_index(tx + rwx * cur, ty + rwy * cur,
                                     tz + rwz * cur)
        rows = march_tab[idx].astype(jnp.float32)
        sdf = rows[:, 0]
        w = jnp.where(allocated, rows[:, 1], 0.0)
        step = jnp.where(w > 0, sdf, cfg.truncation)
        active = (~hit) & (cur < cfg.max_depth)
        # The reference advances BEFORE its break check, so the returned depth
        # includes the final sdf step (GenerateRgbDepthKernel:610-621).
        cur = jnp.where(active, cur + step, cur)
        hit = hit | (active & (w > 0) & (sdf < cfg.voxel_size))
        return cur, hit

    # Seed: splatted surface depth with small holes min-filled (grazing
    # surfaces project sparsely; a missing seed means an empty render for
    # that ray, so close sub-(2^rounds)-pixel gaps first).
    splat = jnp.where(jnp.isfinite(zbuf), zbuf, jnp.inf).reshape(H, W)
    for _ in range(fill_rounds):
        p = jnp.pad(splat, 1, constant_values=jnp.inf)
        m = splat
        for dy in range(3):
            for dx in range(3):
                m = jnp.minimum(m, p[dy:dy + H, dx:dx + W])
        splat = jnp.where(jnp.isfinite(splat), splat, m)
    splat = jnp.where(jnp.isfinite(splat), splat, 0.0).reshape(-1)

    seeded = splat > 0
    cur = jnp.where(seeded,
                    jnp.maximum(splat - 2.0 * cfg.truncation, 0.0), 0.0)
    hit = jnp.zeros(N, jnp.bool_)
    for _ in range(refine_steps):
        cur, hit = advance(cur, hit)

    found = hit & (cur < cfg.max_depth)
    # Trilinear color at the hit point (GetInterpolatedVoxel: per-corner
    # centre-value fallback for empty corners) — 9 narrow-row gathers,
    # all position math component-wise.
    vs = cfg.voxel_size
    ptx = tx + rwx * cur
    pty = ty + rwy * cur
    ptz = tz + rwz * cur
    idx0, alloc0 = voxel_index(ptx, pty, ptz)
    rows0 = color_tab[idx0].astype(jnp.float32)
    w0 = jnp.where(alloc0, rows0[:, 3], 0.0)
    col0 = rows0[:, :3]
    fracx = ptx / vs - jnp.floor(ptx / vs)
    fracy = pty / vs - jnp.floor(pty / vs)
    fracz = ptz / vs - jnp.floor(ptz / vs)
    col_acc = jnp.zeros_like(col0)
    dual_base = -0.5 * vs
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                # corner lookup along the ray parameterization: shift the
                # world point, not the ray depth
                idx, allocated = voxel_index(ptx + ox * vs + dual_base,
                                             pty + oy * vs + dual_base,
                                             ptz + oz * vs + dual_base)
                rows = color_tab[idx].astype(jnp.float32)
                wc = jnp.where(allocated, rows[:, 3], 0.0)
                c = jnp.where((wc > 0)[:, None], rows[:, :3], col0)
                wt = ((fracx if ox else 1 - fracx)
                      * (fracy if oy else 1 - fracy)
                      * (fracz if oz else 1 - fracz))
                col_acc = col_acc + wt[:, None] * c
    col = jnp.where((w0 > 0)[:, None], col_acc, 0.0)

    depth_out = jnp.where(found, cur, 0.0).reshape(H, W)
    color_out = jnp.where(found[:, None], col, 0.0).reshape(H, W, 3)
    return depth_out, color_out
