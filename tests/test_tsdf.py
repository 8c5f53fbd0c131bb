"""TSDF fusion validation: fuse GT depth, raycast it back, extract mesh.

Mirrors the reference's validation approach (SURVEY.md step 3): integrate a
known depth map and check that the rendered depth matches the input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tandem_tpu.mapping.tsdf import (TsdfConfig, create_volume,
                                     allocate_blocks, integrate, raycast)
from tandem_tpu.mapping.mesh import extract_mesh

H, W = 60, 80
CFG = TsdfConfig(voxel_size=0.02, table_dim=64, pool_size=4096,
                 truncation=0.08, max_depth=8.0)


def _camera():
    K = np.array([[70.0, 0, (W - 1) / 2], [0, 70.0, (H - 1) / 2], [0, 0, 1]],
                 np.float32)
    pose = np.eye(4, dtype=np.float32)
    return jnp.asarray(K), jnp.asarray(pose)


def _wall_depth(z=2.0):
    return jnp.full((H, W), z, jnp.float32)


def test_allocate_and_integrate_wall():
    K, pose = _camera()
    depth = _wall_depth()
    color = jnp.broadcast_to(jnp.array([200.0, 60.0, 30.0]), (H, W, 3))

    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    n1 = int(vol.n_allocated)
    assert 0 < n1 < CFG.pool_size

    vol = integrate(CFG, vol, depth, color, K, pose)
    w = np.asarray(vol.weight)
    assert w.max() == 1.0  # single integration, weight 1
    # sdf near zero at the surface: check center pixel voxel
    tsdf = np.asarray(vol.tsdf)
    updated = w > 0
    assert updated.sum() > 1000
    assert np.abs(tsdf[updated]).max() <= CFG.truncation + 1e-5

    # integrate again: weights grow, sdf stable
    vol = integrate(CFG, vol, depth, color, K, pose)
    assert np.asarray(vol.weight).max() == 2.0

    # allocation is idempotent
    vol2 = allocate_blocks(CFG, vol, depth, K, pose)
    assert int(vol2.n_allocated) == n1


def test_integrate_culled_matches_full():
    """Frustum-culled integrate == full-pool walk, exactly: blocks outside
    the frustum fail the in_img test in the full walk anyway, so culling
    only removes no-op work. Also: an away-facing camera sees ~no blocks.

    integrate/integrate_culled DONATE the input volume (linear API), so the
    comparison branches from an explicit copy_volume()."""
    from tandem_tpu.mapping.tsdf import (copy_volume, integrate_culled,
                                         visible_slots)

    K, pose = _camera()
    depth = _wall_depth()
    color = jnp.broadcast_to(jnp.array([200.0, 60.0, 30.0]), (H, W, 3))

    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    n_alloc = int(vol.n_allocated)

    slots, n_vis = visible_slots(CFG, vol, K, pose, H, W)
    n_vis = int(n_vis)
    assert 0 < n_vis <= n_alloc
    # the facing camera sees (nearly) everything it allocated
    assert n_vis > 0.9 * n_alloc

    vol_branch = copy_volume(vol)
    vol_full = integrate(CFG, vol, depth, color, K, pose, chunk=1024)
    vol_cull = integrate_culled(CFG, vol_branch, depth, color, K, pose,
                                slots, n_vis, chunk=1024)
    np.testing.assert_array_equal(np.asarray(vol_full.tsdf),
                                  np.asarray(vol_cull.tsdf))
    np.testing.assert_array_equal(np.asarray(vol_full.weight),
                                  np.asarray(vol_cull.weight))
    np.testing.assert_array_equal(np.asarray(vol_full.color),
                                  np.asarray(vol_cull.color))

    # Away-facing camera: nothing visible, nothing changed
    away = np.eye(4, dtype=np.float32)
    away[:3, :3] = np.diag([1.0, -1.0, -1.0])   # rotate 180 deg about x
    away = jnp.asarray(away)
    slots_a, n_vis_a = visible_slots(CFG, vol_cull, K, away, H, W)
    assert int(n_vis_a) < 0.05 * n_alloc
    vol_a = integrate_culled(CFG, vol_cull, depth, color, K, away, slots_a,
                             int(n_vis_a), chunk=1024)
    assert np.asarray(vol_a.weight).max() == 1.0  # no double integration


def test_integrate_culled_adversarial_poses():
    """visible_slots exactness under adversarial cameras: camera INSIDE the
    allocated band, camera just behind it looking through, and a wide-FOV
    camera (high obliquity — the case a naive fx*r/(z-r) margin misses).
    For each, culled integrate must equal the full-pool walk exactly."""
    from tandem_tpu.mapping.tsdf import (copy_volume, integrate_culled,
                                         visible_slots)

    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.broadcast_to(jnp.array([90.0, 120.0, 200.0]), (H, W, 3))

    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    vol = integrate(CFG, vol, depth, color, K, pose)
    n_alloc = int(vol.n_allocated)
    assert n_alloc > 0

    # wide-FOV camera: fx=fy=25 at 80px wide -> tan(half-FOV) ~ 1.6
    K_wide = jnp.asarray(np.array(
        [[25.0, 0, (W - 1) / 2], [0, 25.0, (H - 1) / 2], [0, 0, 1]],
        np.float32))

    def pose_at(tx, ty, tz):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [tx, ty, tz]
        return jnp.asarray(p)

    cases = [
        (K, pose_at(0.0, 0.0, 1.98)),    # inside the truncation band
        (K, pose_at(0.0, 0.0, 2.02)),    # inside, just past the surface
        (K, pose_at(0.03, -0.02, 1.995)),  # inside, off-center
        (K_wide, pose_at(0.0, 0.0, 1.0)),  # wide FOV, oblique blocks
        (K_wide, pose_at(0.5, 0.3, 1.9)),  # wide FOV from inside the band
    ]
    for Kc, pc in cases:
        slots, n_vis = visible_slots(CFG, vol, Kc, pc, H, W)
        n_vis = int(n_vis)
        vol_branch = copy_volume(vol)
        vol_full = integrate(CFG, copy_volume(vol), depth, color, Kc, pc,
                             chunk=1024)
        vol_cull = integrate_culled(CFG, vol_branch, depth, color, Kc, pc,
                                    slots, n_vis, chunk=1024)
        np.testing.assert_array_equal(np.asarray(vol_full.tsdf),
                                      np.asarray(vol_cull.tsdf))
        np.testing.assert_array_equal(np.asarray(vol_full.weight),
                                      np.asarray(vol_cull.weight))
        np.testing.assert_array_equal(np.asarray(vol_full.color),
                                      np.asarray(vol_cull.color))


def test_raycast_roundtrip_wall():
    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.broadcast_to(jnp.array([200.0, 60.0, 30.0]), (H, W, 3))

    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    for _ in range(3):
        vol = integrate(CFG, vol, depth, color, K, pose)

    rdepth, rcolor = raycast(CFG, vol, (K, pose), H, W)
    rdepth = np.asarray(rdepth)
    # Central crop (borders may miss due to ray angles at band edges)
    crop = rdepth[10:-10, 10:-10]
    hit = crop > 0
    assert hit.mean() > 0.98
    err = np.abs(crop[hit] - 2.0)
    assert np.median(err) < CFG.voxel_size * 1.5, np.median(err)
    assert np.mean(err) < CFG.voxel_size * 3
    # color is rendered
    rc = np.asarray(rcolor)[10:-10, 10:-10]
    assert np.abs(rc[hit][:, 0].mean() - 200.0) < 30


def test_raycast_sphere():
    K, pose = _camera()
    # Sphere of radius 0.5 at (0, 0, 2): analytic depth map
    u = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    v = np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W))
    Kn = np.asarray(K)
    dx = (u - Kn[0, 2]) / Kn[0, 0]
    dy = (v - Kn[1, 2]) / Kn[1, 1]
    # Ray p = t*(dx, dy, 1); |p - c|^2 = r^2 with c = (0,0,2), r = 0.5
    a = dx ** 2 + dy ** 2 + 1
    b = -2 * 2.0
    cc = 4.0 - 0.25
    disc = b ** 2 - 4 * a * cc
    tmin = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0)
    depth = jnp.asarray(np.where(disc > 0, tmin, 0).astype(np.float32))
    color = jnp.full((H, W, 3), 128.0)

    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    vol = integrate(CFG, vol, depth, color, K, pose)

    rdepth, _ = raycast(CFG, vol, (K, pose), H, W)
    rdepth = np.asarray(rdepth)
    gt = np.asarray(depth)
    both = (rdepth > 0) & (gt > 0)
    assert both.sum() > 100
    err = np.abs(rdepth[both] - gt[both])
    assert np.median(err) < CFG.voxel_size * 2


def test_render_depth_splat_wall():
    from tandem_tpu.mapping.tsdf import render_depth_splat
    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.full((H, W, 3), 100.0)
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    for _ in range(3):
        vol = integrate(CFG, vol, depth, color, K, pose)

    rdepth = np.asarray(render_depth_splat(CFG, vol, K, pose, H, W))
    crop = rdepth[8:-8, 8:-8]
    hit = crop > 0
    assert hit.mean() > 0.97
    err = np.abs(crop[hit] - 2.0)
    assert np.median(err) < CFG.voxel_size * 1.5, np.median(err)

    # From a shifted pose: still consistent
    pose2 = jnp.asarray(np.array(
        [[1, 0, 0, 0.15], [0, 1, 0, 0.0], [0, 0, 1, -0.3], [0, 0, 0, 1]],
        np.float32))
    r2 = np.asarray(render_depth_splat(CFG, vol, K, pose2, H, W))
    hit2 = r2[10:-10, 14:-14] > 0
    assert hit2.mean() > 0.9
    err2 = np.abs(r2[10:-10, 14:-14][hit2] - 2.3)
    assert np.median(err2) < CFG.voxel_size * 2


def test_extract_mesh_wall():
    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.full((H, W, 3), 100.0)
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    vol = integrate(CFG, vol, depth, color, K, pose)

    verts, faces, cols = extract_mesh(CFG, vol)
    assert verts.shape[0] > 100
    assert faces.shape == (verts.shape[0] // 3, 3)
    # Vertices concentrate near the z=2 plane
    assert np.abs(np.median(verts[:, 2]) - 2.0) < 0.05
    assert np.percentile(np.abs(verts[:, 2] - 2.0), 90) < CFG.truncation


def test_splat_cross_block_faces():
    """Zero crossings that straddle a block face must be recovered from the
    +axis neighbour's first slice (pair_tab path in _splat_chunk).

    A wall at z=2.07 m with 2 cm voxels crosses between grid positions
    103 (block 12, local 7) and 104 (block 13, local 0) — the z-face path.
    The same wall viewed by a camera rotated 90 deg about y exercises the
    x-face path.
    """
    from tandem_tpu.mapping.tsdf import render_depth_splat
    K, pose = _camera()
    color = jnp.full((H, W, 3), 90.0)

    # z-face: fronto-parallel wall at a block-boundary crossing.
    vol = create_volume(CFG)
    depth = _wall_depth(2.07)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    for _ in range(3):
        vol = integrate(CFG, vol, depth, color, K, pose)
    r = np.asarray(render_depth_splat(CFG, vol, K, pose, H, W))
    crop = r[10:-10, 10:-10]
    hit = crop > 0
    assert hit.mean() > 0.97
    assert np.median(np.abs(crop[hit] - 2.07)) < CFG.voxel_size * 1.5

    # x-face: the same geometry, but integrated from a camera looking
    # along +x (rotation about y by 90 deg) so the surface crosses along
    # the world x axis at x = 2.07 = block boundary + one voxel.
    Ry = np.array([[0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0], [0, 0, 0, 1]],
                  np.float32)
    pose_x = jnp.asarray(Ry)
    vol2 = create_volume(CFG)
    vol2 = allocate_blocks(CFG, vol2, depth, K, pose_x)
    for _ in range(3):
        vol2 = integrate(CFG, vol2, depth, color, K, pose_x)
    r2 = np.asarray(render_depth_splat(CFG, vol2, K, pose_x, H, W))
    crop2 = r2[10:-10, 10:-10]
    hit2 = crop2 > 0
    assert hit2.mean() > 0.97
    assert np.median(np.abs(crop2[hit2] - 2.07)) < CFG.voxel_size * 1.5


def test_pool_overflow_growth():
    """Pool exhaustion: drops are COUNTED (n_dropped — the reference aborts
    instead, heap.cu:16-18), growth is pure padding, and the idempotent
    allocate retry converges to exactly the same allocation a big-enough
    pool produces up front."""
    import dataclasses
    from tandem_tpu.mapping.tsdf import grow_volume

    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.full((H, W, 3), 100.0)

    small = dataclasses.replace(CFG, pool_size=64, pool_max=4096)
    vol = create_volume(small)
    vol = allocate_blocks(small, vol, depth, K, pose)
    assert int(vol.n_allocated) == 64          # saturated
    assert int(vol.n_dropped) > 0              # drops are observable

    cfg = small
    prev_drop = int(vol.n_dropped)
    for _ in range(10):
        cfg, vol = grow_volume(cfg, vol)
        vol = allocate_blocks(cfg, vol, depth, K, pose)
        d = int(vol.n_dropped)
        if d == prev_drop:
            break
        prev_drop = d
    assert int(vol.n_dropped) == prev_drop     # converged, pool big enough

    big = dataclasses.replace(CFG, pool_size=4096)
    ref = allocate_blocks(big, create_volume(big), depth, K, pose)
    assert int(vol.n_allocated) == int(ref.n_allocated)
    # the grown volume's allocated block set == the fresh one's
    pt_g = np.asarray(vol.page_table) >= 0
    pt_r = np.asarray(ref.page_table) >= 0
    np.testing.assert_array_equal(pt_g, pt_r)

    # integrate + render work on the grown volume
    vol = integrate(cfg, vol, depth, color, K, pose, chunk=512)
    assert np.asarray(vol.weight).max() == 1.0
    from tandem_tpu.mapping.tsdf import render_depth_splat
    r = np.asarray(render_depth_splat(cfg, vol, K, pose, H, W, chunk=512))
    crop = r[10:-10, 10:-10]
    hit = crop > 0
    assert hit.mean() > 0.95
    assert np.median(np.abs(crop[hit] - 2.0)) < CFG.voxel_size * 1.5

    # grow_volume refuses to exceed pool_max
    capped = dataclasses.replace(CFG, pool_size=128, pool_max=128)
    v2 = create_volume(capped)
    c2, v2 = grow_volume(capped, v2)
    assert c2.pool_size == 128


def test_raycast_roundtrip_concave_corner():
    """Concave scene (VERDICT r2 item 9): a room corner — a frontal wall
    at z=2.2 meeting a side wall at x=0.75 — integrated from the origin
    and rendered back from a DIFFERENT pose inside the concavity. The
    roundtrip error must stay within a voxel on the median; occlusion
    ordering must pick the nearer surface per ray."""
    K, pose = _camera()
    Kn = np.asarray(K)

    def analytic_depth(cam_t):
        u = np.tile(np.arange(W, dtype=np.float32), (H, 1))
        v = np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W))
        dx = (u - Kn[0, 2]) / Kn[0, 0]
        dy = (v - Kn[1, 2]) / Kn[1, 1]
        # Rays from cam_t along (dx, dy, 1) (no rotation). Surface 1:
        # z = 2.2 plane. Surface 2: x = 0.75 plane (hit only for dx > 0).
        t_front = 2.2 - cam_t[2]                       # ray z-param
        x_at_front = cam_t[0] + dx * t_front
        t_side = np.where(dx > 1e-6, (0.75 - cam_t[0]) / dx, np.inf)
        hit_side = (t_side > 0) & (t_side < t_front)
        z = np.where(hit_side, t_side, t_front)
        x = cam_t[0] + dx * z
        ok = x <= 0.75 + 1e-6
        return np.where(ok, z, 0).astype(np.float32)

    depth0 = jnp.asarray(analytic_depth(np.zeros(3)))
    color = jnp.full((H, W, 3), 90.0)
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth0, K, pose)
    for _ in range(3):
        vol = integrate(CFG, vol, depth0, color, K, pose)

    # Second view from inside the concavity, shifted toward the corner.
    t2 = np.array([0.25, 0.05, 0.6], np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[:3, 3] = t2
    rdepth, _ = raycast(CFG, vol, (K, jnp.asarray(pose2)), H, W)
    rdepth = np.asarray(rdepth)
    gt2 = analytic_depth(t2)
    crop = np.s_[8:-8, 8:-8]
    r, g = rdepth[crop], gt2[crop]
    both = (r > 0) & (g > 0)
    assert both.mean() > 0.7
    err = np.abs(r[both] - g[both])
    assert np.median(err) < CFG.voxel_size * 1.5, np.median(err)
    # The side wall (concave part) specifically must be present and close:
    side = both & (np.abs(g - 2.2 + t2[2]) > 0.1)
    assert side.sum() > 50
    assert np.median(np.abs(r[side] - g[side])) < CFG.voxel_size * 2.5


def test_pack_scan_split_precision():
    """The f16x8 scan pack (gather-rate optimization) must reconstruct depth
    to ~2^-21 relative error and colors exactly."""
    from tandem_tpu.mapping.tsdf import _pack_scan

    rng = np.random.RandomState(7)
    depth = jnp.asarray((0.1 + 9.8 * rng.rand(H, W)).astype(np.float32))
    color = jnp.asarray(rng.randint(0, 256, (H, W, 3)).astype(np.float32))
    K, _ = _camera()
    dc, _, _ = _pack_scan(depth, color, jnp.eye(4), K)
    assert dc.dtype == jnp.float16 and dc.shape == (H * W, 8)
    d_rec = (np.asarray(dc[:, 0], np.float32)
             + np.asarray(dc[:, 1], np.float32))
    d_ref = np.asarray(depth).reshape(-1)
    assert np.abs(d_rec - d_ref).max() <= d_ref.max() * 2.0 ** -21
    np.testing.assert_array_equal(np.asarray(dc[:, 2:5], np.float32),
                                  np.asarray(color).reshape(-1, 3))
    # Lanes 5-6: split-precision per-pixel ray norm |K^-1 (u, v, 1)|.
    Kn = np.asarray(K)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    ru = (u - Kn[0, 2]) / Kn[0, 0]
    rv = (v - Kn[1, 2]) / Kn[1, 1]
    n_ref = np.sqrt(ru * ru + rv * rv + 1.0).reshape(-1)
    n_rec = (np.asarray(dc[:, 5], np.float32)
             + np.asarray(dc[:, 6], np.float32))
    assert np.abs(n_rec - n_ref).max() <= n_ref.max() * 2.0 ** -20


def test_splat_culled_matches_full():
    """The frustum-culled splat (render_depth_splat with slots=) must equal
    the full-pool walk exactly for on-surface, offset, and wide-FOV render
    cameras — out-of-frustum blocks cannot contribute to the z-buffer, and
    visible_slots is provably conservative."""
    from tandem_tpu.mapping.tsdf import render_depth_splat, visible_slots

    K, pose = _camera()
    depth = _wall_depth(2.0)
    color = jnp.broadcast_to(jnp.array([90.0, 120.0, 200.0]), (H, W, 3))
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    vol = integrate(CFG, vol, depth, color, K, pose)
    n_alloc = int(vol.n_allocated)

    K_wide = jnp.asarray(np.array(
        [[25.0, 0, (W - 1) / 2], [0, 25.0, (H - 1) / 2], [0, 0, 1]],
        np.float32))

    def pose_at(tx, ty, tz):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [tx, ty, tz]
        return jnp.asarray(p)

    cases = [(K, pose), (K, pose_at(0.3, -0.2, 0.5)),
             (K_wide, pose_at(0.0, 0.0, 1.0)),
             (K, pose_at(0.0, 0.0, 1.98))]
    for Kc, pc in cases:
        slots, n_vis = visible_slots(CFG, vol, Kc, pc, H, W)
        full = render_depth_splat(CFG, vol, Kc, pc, H, W, chunk=1024,
                                  n_allocated=n_alloc)
        cull = render_depth_splat(CFG, vol, Kc, pc, H, W, chunk=1024,
                                  n_allocated=n_alloc, slots=slots,
                                  n_visible=int(n_vis))
        np.testing.assert_array_equal(np.asarray(full), np.asarray(cull))


def test_splat_axis_culled_matches_full():
    """The per-axis surface-culled splat (render_depth_splat with
    axis_slots=) must equal the full-pool walk bit-exactly: a (block, axis)
    pair is culled only when NO column of that axis can hold a crossing and
    no face-straddling crossing with the +axis neighbour is possible
    (surface_axis_slots is conservative by construction)."""
    from tandem_tpu.mapping.tsdf import (render_depth_splat,
                                         surface_axis_slots)

    K, pose = _camera()
    # Curved surface: crossings in all three axes, plus flat-wall regions
    # where x/y columns have none (the culling must fire there).
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth = jnp.asarray((2.0 + 0.5 * np.sin(u * 0.15) * np.cos(v * 0.12))
                        .astype(np.float32))
    color = jnp.broadcast_to(jnp.array([90.0, 120.0, 200.0]), (H, W, 3))
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    vol = integrate(CFG, vol, depth, color, K, pose)
    # Second scan from an offset camera: face-straddling crossings and
    # mixed-weight blocks.
    p2 = np.eye(4, dtype=np.float32)
    p2[:3, 3] = [0.15, -0.1, 0.3]
    vol = allocate_blocks(CFG, vol, depth, K, jnp.asarray(p2))
    vol = integrate(CFG, vol, depth, color, K, jnp.asarray(p2))
    n_alloc = int(vol.n_allocated)
    n_pad = -(-max(n_alloc, 1) // 1024) * 1024

    def pose_at(tx, ty, tz):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [tx, ty, tz]
        return jnp.asarray(p)

    cases = [(K, pose), (K, pose_at(0.3, -0.2, 0.5)),
             (K, pose_at(0.0, 0.0, 1.9))]
    total = 0
    for Kc, pc in cases:
        slots3, counts3 = surface_axis_slots(CFG, vol, Kc, pc, H, W, n_pad)
        counts = [int(c) for c in np.asarray(counts3)]
        total += sum(counts)
        full = render_depth_splat(CFG, vol, Kc, pc, H, W, chunk=1024,
                                  n_allocated=n_alloc)
        cull = render_depth_splat(CFG, vol, Kc, pc, H, W, chunk=1024,
                                  n_allocated=n_alloc, axis_slots=slots3,
                                  axis_counts=counts)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(cull))
        # The cull must actually cull: strictly fewer (block, axis) pairs
        # than the 3 * n_alloc of the full walk.
        assert sum(counts) < 3 * n_alloc
    assert total > 0


def test_grow_then_axis_culled_splat():
    """After grow_volume the pool shape (and so every jit signature keyed
    on it) changes; the surface-culled render must stay bit-exact on the
    grown volume — guards the _pad_sched/pool_size interplay."""
    import dataclasses
    from tandem_tpu.mapping.tsdf import (grow_volume, render_depth_splat,
                                         surface_axis_slots)

    K, pose = _camera()
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth = jnp.asarray((2.0 + 0.5 * np.sin(u * 0.15) * np.cos(v * 0.12))
                        .astype(np.float32))
    color = jnp.full((H, W, 3), 100.0)

    cfg = dataclasses.replace(CFG, pool_size=256, pool_max=8192)
    vol = create_volume(cfg)
    vol = allocate_blocks(cfg, vol, depth, K, pose)
    for _ in range(8):
        prev = int(vol.n_dropped)
        cfg, vol = grow_volume(cfg, vol)
        vol = allocate_blocks(cfg, vol, depth, K, pose)
        if int(vol.n_dropped) == prev:
            break
    vol = integrate(cfg, vol, depth, color, K, pose)
    n = int(vol.n_allocated)
    assert n > 256  # the scene outgrew the initial pool
    n_pad = -(-n // 1024) * 1024

    slots3, counts3 = surface_axis_slots(cfg, vol, K, pose, H, W, n_pad)
    counts = [int(c) for c in np.asarray(counts3)]
    full = render_depth_splat(cfg, vol, K, pose, H, W, chunk=1024,
                              n_allocated=n)
    cull = render_depth_splat(cfg, vol, K, pose, H, W, chunk=1024,
                              n_allocated=n, axis_slots=slots3,
                              axis_counts=counts)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cull))
