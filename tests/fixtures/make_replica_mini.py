"""Generate the committed miniature Replica-TANDEM-Ext fixture.

Synthesizes a small analytic room-corner scene (back wall + side wall +
floor, procedurally textured) in the EXACT on-disk format of the
Replica-TANDEM-Ext dataset (reference replica/README.md; consumed by
datasets.py:276-521 / our data/replica.py):

    replica_mini/
      val.txt                      one line of scene names
      scene0/
        camera.txt                 "fx fy cx cy 0" + "W H"
        poses_gt.txt               "idx m00 m01 ... m33" per frame
        tuples_dso_optimization_windows.txt   "7 f0..f6 1.0" per tuple
        images/%06d.png            RGB
        depths/%06d.png            uint16, metres = png * scale
        depths/scale.txt

The scene is exactly renderable (nearest-positive ray/plane intersection),
so the committed depths are perfect GT — the closest attainable stand-in
for Replica until real data exists (pretrained/ablation/*.txt parity).

Run once from the repo root:  python tests/fixtures/make_replica_mini.py
The outputs are committed; tests consume the committed files.
"""

import os

import numpy as np

try:
    import cv2
except ImportError as e:  # pragma: no cover
    raise SystemExit(f"cv2 required to (re)generate the fixture: {e}")

ROOT = os.path.join(os.path.dirname(__file__), "replica_mini")
W, H = 512, 320
FX = FY = 300.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0
N_FRAMES = 10
DEPTH_SCALE = 2.0e-4   # metres per uint16 unit (max 13.1 m)

# Room-corner geometry: nearest positive hit among three planes n.p = d.
PLANES = [
    (np.array([0.0, 0.0, 1.0]), 3.2),    # back wall
    (np.array([-0.45, 0.0, 1.0]), 2.2),  # angled side wall (hits on +x side)
    (np.array([0.0, 1.0, 0.0]), 0.9),    # floor (camera looks slightly down)
]


def _hash3(i, j, k):
    """Deterministic lattice hash -> [0, 1) (shader-style fract(sin))."""
    s = np.sin(i * 12.9898 + j * 78.233 + k * 37.719 + 0.5) * 43758.5453
    return s - np.floor(s)


def _value_noise(p, freq):
    """Trilinear value noise on a world-space lattice. APERIODIC on purpose:
    a periodic (trig) texture creates false plane-sweep matches at the fine
    cascade stages once the adaptive range spans a texture period (observed:
    stage1 abs_rel 0.005 but stage2/3 ~0.2 on a sinusoid texture)."""
    q = p * freq
    q0 = np.floor(q)
    f = q - q0
    f = f * f * (3.0 - 2.0 * f)          # smoothstep fade
    i, j, k = q0[..., 0], q0[..., 1], q0[..., 2]
    out = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = ((f[..., 0] if di else 1 - f[..., 0])
                     * (f[..., 1] if dj else 1 - f[..., 1])
                     * (f[..., 2] if dk else 1 - f[..., 2]))
                out = out + w * _hash3(i + di, j + dj, k + dk)
    return out


def texture(p):
    """Replica-like piecewise-flat decor: aperiodic value-noise fields
    QUANTIZED into large flat color regions with sharp borders (posters /
    tiles / paint patches), plus soft shading. Gray unquantized noise is
    out-of-distribution for the trained FeatureNet — the fine cascade
    stages texture-lock on it (measured stage3 abs_rel 0.13 vs 0.006 on
    this decor); indoor-statistics content matters more than randomness."""
    n1 = _value_noise(p, 2.3)
    n2 = _value_noise(p + 53.7, 5.9)
    n3 = _value_noise(p + 91.1, 13.7)
    region = (np.floor(n1 * 5 + n2 * 2.2) % 5).astype(np.int64)
    palette = np.array([
        [0.82, 0.78, 0.70],   # warm wall
        [0.35, 0.42, 0.55],   # blue panel
        [0.62, 0.30, 0.25],   # brick red
        [0.28, 0.50, 0.33],   # green poster
        [0.88, 0.85, 0.60],   # cream
    ])
    rgb = palette[region]
    # sub-region detail: a second sharp-edge layer inside each region
    sub = (n3 > 0.55).astype(np.float64)
    rgb = rgb * (0.82 + 0.18 * sub[..., None])
    # smooth lighting falloff
    shade = 0.75 + 0.25 * _value_noise(p + 7.7, 0.9)
    rgb = rgb * shade[..., None]
    return (np.clip(rgb, 0.02, 0.98) * 255).astype(np.uint8)


def _ray_box(t, dirs, lo, hi):
    """Slab-test ray/AABB entry parameter (inf where missed)."""
    inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
    t0 = (lo - t) * inv
    t1 = (hi - t) * inv
    tn = np.minimum(t0, t1).max(axis=-1)
    tf = np.maximum(t0, t1).min(axis=-1)
    hit = (tn < tf) & (tn > 0.05)
    return np.where(hit, tn, np.inf)


def render(c2w, w=None, h=None, fx=None, fy=None, cx=None, cy=None,
           boxes=None, ss=1):
    """Ray-cast the analytic scene: returns (rgb u8 HxWx3, depth f32 HxW).
    Defaults render scene0 at the module intrinsics; the trajectory scene
    passes its own (smaller) camera plus free-standing boxes (depth
    discontinuities + strong parallax — the monocular initializer and the
    BA need non-coplanar structure).

    :param ss: supersampling factor (odd). The decor has SHARP quantized
        edges; point-sampling them aliases, making two viewpoints
        photometrically inconsistent by several intensity levels exactly
        at the high-gradient pixels gradient-weighted tracking relies on
        (measured: a GT-depth coarse-tracker ref converges ~7 mm off on
        ss=1 renders vs sub-mm on ss=3). ss=3 box-filters 9 rays/pixel;
        depth keeps the exact center ray (no false mid-edge depths)."""
    w = W if w is None else w
    h = H if h is None else h
    fx = FX if fx is None else fx
    fy = FY if fy is None else fy
    cx = (w - 1) / 2.0 if cx is None else cx
    cy = (h - 1) / 2.0 if cy is None else cy
    if ss > 1:
        assert ss % 2 == 1, "ss must be odd so a center ray exists"
        rgb_s, depth_s = render(
            c2w, w=w * ss, h=h * ss, fx=fx * ss, fy=fy * ss,
            cx=(cx + 0.5) * ss - 0.5, cy=(cy + 0.5) * ss - 0.5, boxes=boxes)
        rgb = rgb_s.astype(np.float64).reshape(h, ss, w, ss, 3).mean((1, 3))
        depth = depth_s.reshape(h, ss, w, ss)[:, ss // 2, :, ss // 2]
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8), depth
    us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    dirs_cam = np.stack([(us - cx) / fx, (vs - cy) / fy,
                         np.ones_like(us)], -1)
    R, t = c2w[:3, :3], c2w[:3, 3]
    dirs = dirs_cam @ R.T
    tmin = np.full((h, w), np.inf)
    for n, d in PLANES:
        denom = dirs @ n
        ti = (d - t @ n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        ti = np.where((denom > 1e-9) & (ti > 0.05), ti, np.inf)
        tmin = np.minimum(tmin, ti)
    for lo, hi in (boxes or []):
        tmin = np.minimum(tmin, _ray_box(t, dirs, lo, hi))
    hit = np.isfinite(tmin)
    tz = np.where(hit, tmin, 0.0)
    pts = t + dirs * tz[..., None]
    rgb = texture(pts)
    rgb[~hit] = 0
    depth = tz * dirs_cam[..., 2]     # z-depth = t * 1 (cam z component)
    return rgb, depth.astype(np.float32)


def poses():
    """Lateral dolly with small yaw/pitch: enough baseline for 7-view MVS
    (~5 cm/frame at 2-3 m depth) while keeping all frames co-visible."""
    out = []
    for i in range(N_FRAMES):
        yaw = -0.015 * (i - N_FRAMES / 2)
        pitch = 0.12 + 0.004 * np.sin(i)
        Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                       [-np.sin(yaw), 0, np.cos(yaw)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)],
                       [0, np.sin(pitch), np.cos(pitch)]])
        c2w = np.eye(4)
        c2w[:3, :3] = Ry @ Rx
        c2w[:3, 3] = [0.05 * i - 0.15, -0.02 + 0.005 * np.sin(2.1 * i),
                      0.01 * i]
        out.append(c2w)
    return out


# --------------------------------------------------------------------------
# Trajectory-grade scene (replica_traj/): the EuRoC stand-in. 64 frames at
# 256x192 through the same room corner plus a free-standing box, long enough
# for the monocular initializer to snap, the 7-KF window to fill and the
# TANDEM feedback loop (MVS depth -> TSDF -> rendered depth -> dense
# tracking) to run for many keyframes. Written in BOTH formats: Replica
# (MVSDataset-readable) and the DSO drive format (camera_dso.txt + gt_tum.txt
# for cli.tandem_dataset + eval/ate.py), mirroring what
# tracking_euroc_eval.bash feeds evaluate_ate.py in the reference.
# --------------------------------------------------------------------------
TRAJ_ROOT = os.path.join(os.path.dirname(__file__), "replica_traj")
TW, TH = 256, 192
TFX = TFY = 200.0
TCX, TCY = (TW - 1) / 2.0, (TH - 1) / 2.0
T_FRAMES = 64
BOXES = [
    (np.array([0.35, 0.25, 1.70]), np.array([0.85, 0.90, 2.15])),
    (np.array([-1.05, 0.45, 2.30]), np.array([-0.55, 0.90, 2.75])),
]


def _rot(yaw, pitch, roll):
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)],
                   [0, np.sin(pitch), np.cos(pitch)]])
    Rz = np.array([[np.cos(roll), -np.sin(roll), 0],
                   [np.sin(roll), np.cos(roll), 0], [0, 0, 1]])
    return Ry @ Rx @ Rz


def traj_poses():
    """A smooth lateral sweep with yaw pan, gentle dolly-in and handheld
    bob: ~1 cm/frame translation at 1.5-3 m depth gives the parallax the
    initializer needs while keeping the DSO flow indicator below the
    KF-every-frame regime at this small resolution (the KF rule normalizes
    flow by w+h, FullSystem.cpp:1038-1058, so a 256-wide camera keyframes
    ~2.5x more eagerly than 640x480 for the same metric motion)."""
    out = []
    for i in range(T_FRAMES):
        u = i / (T_FRAMES - 1)
        yaw = 0.06 - 0.16 * u + 0.010 * np.sin(5.0 * u * np.pi)
        pitch = 0.11 + 0.012 * np.sin(3.1 * u * np.pi)
        roll = 0.008 * np.sin(2.3 * u * np.pi)
        c2w = np.eye(4)
        c2w[:3, :3] = _rot(yaw, pitch, roll)
        c2w[:3, 3] = [-0.36 + 0.66 * u,
                      -0.10 + 0.018 * np.sin(4.2 * u * np.pi),
                      -0.30 + 0.28 * u + 0.02 * np.sin(2.7 * u * np.pi)]
        out.append(c2w)
    return out


def _mat_to_tum(ts, c2w):
    """One TUM line: timestamp tx ty tz qx qy qz qw."""
    R, t = c2w[:3, :3], c2w[:3, 3]
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw, qx, qy, qz = (0.25 * s, (R[2, 1] - R[1, 2]) / s,
                          (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s)
    else:
        k = int(np.argmax(np.diag(R)))
        i, j, l = k, (k + 1) % 3, (k + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[l, l] + 1.0) * 2
        q = [0.0] * 4
        q[i] = 0.25 * s
        q[3] = (R[l, j] - R[j, l]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[l] = (R[l, i] + R[i, l]) / s
        qx, qy, qz, qw = q
    return (f"{ts:.6f} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
            f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}")


def make_traj_scene():
    scene = os.path.join(TRAJ_ROOT, "scene0")
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene, "depths"), exist_ok=True)

    with open(os.path.join(TRAJ_ROOT, "val.txt"), "w") as f:
        f.write("scene0\n")
    with open(os.path.join(scene, "camera.txt"), "w") as f:
        f.write(f"{TFX} {TFY} {TCX} {TCY} 0\n{TW} {TH}\n")
    # DSO drive calib for cli.tandem_dataset (Undistort pinhole format).
    with open(os.path.join(scene, "camera_dso.txt"), "w") as f:
        f.write(f"Pinhole {TFX} {TFY} {TCX} {TCY} 0\n{TW} {TH}\n"
                f"none\n{TW} {TH}\n")
    with open(os.path.join(scene, "depths", "scale.txt"), "w") as f:
        f.write(f"{DEPTH_SCALE}\n")

    ps = traj_poses()
    with open(os.path.join(scene, "poses_gt.txt"), "w") as f:
        for i, p in enumerate(ps):
            vals = " ".join(f"{v:.9f}" for v in p.reshape(-1))
            f.write(f"{i} {vals}\n")
    # TUM-format GT for tandem_ate / eval/ate.py. Timestamps are i/30 s —
    # the reader's default stamping for folders without times.txt
    # (data/reader.py _load_timestamps), so result.txt associates 1:1.
    with open(os.path.join(scene, "gt_tum.txt"), "w") as f:
        for i, p in enumerate(ps):
            f.write(_mat_to_tum(i / 30.0, p) + "\n")
    with open(os.path.join(scene,
                           "tuples_dso_optimization_windows.txt"), "w") as f:
        for s in range(0, T_FRAMES - 6, 4):   # 15 seven-view windows
            idxs = " ".join(str(s + j) for j in range(7))
            f.write(f"7 {idxs} 1.0\n")

    for i, p in enumerate(ps):
        rgb, depth = render(p, w=TW, h=TH, fx=TFX, fy=TFY, cx=TCX, cy=TCY,
                            boxes=BOXES, ss=3)
        cv2.imwrite(os.path.join(scene, "images", f"{i:06d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_PNG_COMPRESSION, 9])
        d16 = np.clip(np.round(depth / DEPTH_SCALE), 0, 65535).astype(
            np.uint16)
        cv2.imwrite(os.path.join(scene, "depths", f"{i:06d}.png"), d16)
    dmins = [render(p, w=TW, h=TH, fx=TFX, fy=TFY, boxes=BOXES)[1] for p
             in (ps[0], ps[-1])]
    print(f"traj scene: {T_FRAMES} frames {TW}x{TH}, depth "
          f"[{min(d[d > 0].min() for d in dmins):.2f}, "
          f"{max(d.max() for d in dmins):.2f}] m -> {TRAJ_ROOT}")


# --------------------------------------------------------------------------
# Adversarial trajectory (adv_traj/): the hard-sequence stand-in (VERDICT r4
# item 4; reference discipline: scripts/tracking_euroc_eval.bash runs 4 EuRoC
# sequences x 5). 208 frames at 256x192 through the same room, engineered to
# exercise every runtime failure-handling path in one run:
#   frames   0- 11  rotation-only opening -> the monocular initializer must
#                   NOT snap (rotation-only guard) and the CLI auto-reset
#                   path (main_tandem_pangolin.cpp:237-255) runs in anger;
#   frames  12- 69  forward+lateral cruise (init snaps once parallax exists);
#   frames  70-109  strong yaw pan away (rotation-heavy, little baseline);
#   frames 110-149  pan BACK (occlusion-heavy revisit of earlier structure);
#   frames 150-155  velocity jerk (~6x the cruise motion in one frame) ->
#                   the constant-velocity prior fails and the trackNewCoarse
#                   retry ladder (FullSystem.cpp:600-607) must fire;
#   frames 156-207  close pass by box 1 (large FoV occluder) + recovery.
# Photometrically NON-TRIVIAL: stored images are G(e_i * V * L) — a gamma-2.2
# response, a strong radial vignette (0.55 at the corners) and a +-0.4-stop
# exposure ramp written to times.txt — so PhotometricUndistorter
# (Undistort.h:40) and the tracker/BA affine-light chain run end to end.
# DSO drive format only (images/ + camera_dso + pcalib + vignette + gt_tum):
# no depth GT is committed, the gate is trajectory ATE (tests/test_vo_ate.py).
# --------------------------------------------------------------------------
ADV_ROOT = os.path.join(os.path.dirname(__file__), "adv_traj")
A_FRAMES = 208
# Extra structure along the ANGLED SIDE WALL, in view during the yaw pan:
# without it the pan's view degenerates to a single textured plane — the
# monocular homography gauge (verify-skill plane caveat) and the window
# loses conditioning right there (observed: reset at frame ~95 across
# three trajectory variants).
ADV_BOXES = BOXES + [
    (np.array([1.10, 0.30, 2.30]), np.array([1.55, 0.90, 2.75])),
    (np.array([1.95, 0.10, 2.75]), np.array([2.45, 0.90, 3.20])),
    (np.array([0.60, -0.60, 2.60]), np.array([1.10, -0.20, 3.05])),
]
GAMMA = 2.2
VIG_MIN = 0.70


def adv_poses():
    segs = []
    # 0-11: rotation-only (yaw sweep, zero translation) — init must refuse.
    for i in range(12):
        segs.append((0.030 * i, 0.10, 0.0, np.array([-0.30, -0.10, -0.35])))
    # 12-69: cruise. ~1.1 cm/frame forward+lateral, mild yaw back to 0.
    for i in range(58):
        u = i / 57.0
        t = np.array([-0.30 + 0.42 * u, -0.10 + 0.015 * np.sin(4 * u * np.pi),
                      -0.35 + 0.30 * u])
        segs.append((0.36 - 0.30 * u, 0.10 + 0.01 * np.sin(3 * u * np.pi),
                     0.006 * np.sin(2 * u * np.pi), t))
    # 70-109: rotation-heavy ORBIT away: +0.55 rad yaw over 40 frames while
    # arcing right/forward (~1.2 cm/frame baseline, so immature points can
    # still mature — pure pans starve monocular depth, which is a real DSO
    # failure mode, not a robustness test).
    for i in range(40):
        u = i / 39.0
        yaw = 0.06 + 0.45 * u
        t = np.array([0.12 + 0.85 * (np.sin(yaw) - np.sin(0.06)),
                      -0.085,
                      -0.05 - 0.70 * (np.cos(yaw) - np.cos(0.06))])
        segs.append((yaw, 0.10, 0.0, t))
    t_pan = segs[-1][3]
    # 110-149: orbit BACK (occlusion-heavy revisit of earlier structure).
    for i in range(40):
        u = i / 39.0
        yaw = 0.51 - 0.48 * u
        t = np.array([t_pan[0] + 0.80 * (np.sin(yaw) - np.sin(0.51)),
                      -0.085 + 0.010 * np.sin(3 * u * np.pi),
                      t_pan[2] - 0.65 * (np.cos(yaw) - np.cos(0.51))])
        segs.append((yaw, 0.10 + 0.008 * np.sin(2 * u * np.pi), 0.0, t))
    # 150-155: jerk — ~4x cruise motion per frame, plus a yaw kick. The
    # constant-velocity prior is wrong by several pixels of flow: the
    # trackNewCoarse retry ladder must fire and recover.
    for i in range(6):
        t = segs[-1][3] + np.array([0.038, 0.006, 0.020])
        segs.append((0.03 + 0.018 * (i + 1), 0.10, 0.003 * i, t))
    base = segs[-1][3]
    # 156-207: close pass by box 1 (near [0.35..0.85]x, z 1.7..2.15) then out.
    n = A_FRAMES - len(segs)
    for i in range(n):
        u = i / (n - 1)
        t = base + np.array([0.26 * u, -0.015 * np.sin(2 * u * np.pi),
                             0.55 * u])          # dolly IN toward the box
        segs.append((0.18 - 0.22 * u, 0.10 + 0.02 * u,
                     0.006 * np.sin(3 * u * np.pi), t))
    out = []
    for yaw, pitch, roll, t in segs:
        c2w = np.eye(4)
        c2w[:3, :3] = _rot(yaw, pitch, roll)
        c2w[:3, 3] = t
        out.append(c2w)
    return out


def _vignette(h, w):
    """Radial falloff, 1.0 at center -> VIG_MIN at the far corner."""
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    r2 = (((xs - (w - 1) / 2) / ((w - 1) / 2)) ** 2
          + ((ys - (h - 1) / 2) / ((h - 1) / 2)) ** 2) / 2.0
    return 1.0 - (1.0 - VIG_MIN) * r2


def adv_exposures():
    """Per-frame exposure: a slow ~0.8-stop ramp around 0.92 plus a sharp
    2-frame dip at the jerk (auto-exposure reacting to the dark box).
    The ceiling keeps e * V * L < 255 everywhere: highlight CLIPPING would
    flatten the brightest decor patches into gradient-free saturation —
    a fixture artifact (measured: cruise-segment ATE 70 mm with the
    clipping ramp vs 10.5 mm without photometrics), not the photometric-
    robustness stimulus this sequence is for."""
    e = []
    for i in range(A_FRAMES):
        u = i / (A_FRAMES - 1)
        v = 0.95 + 0.18 * np.sin(2 * np.pi * 1.5 * u)
        if 150 <= i < 154:
            v *= 0.80
        e.append(v)
    return e


def make_adv_scene():
    scene = os.path.join(ADV_ROOT, "scene0")
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)

    with open(os.path.join(scene, "camera_dso.txt"), "w") as f:
        f.write(f"Pinhole {TFX} {TFY} {TCX} {TCY} 0\n{TW} {TH}\n"
                f"none\n{TW} {TH}\n")

    # Camera response G(x) = 255*(x/255)^(1/GAMMA); pcalib.txt stores the
    # inverse response G^-1 over stored values 0..255 (DSO pcalib format).
    p = np.arange(256, dtype=np.float64)
    with open(os.path.join(scene, "pcalib.txt"), "w") as f:
        f.write(" ".join(f"{255.0 * (v / 255.0) ** GAMMA:.6f}" for v in p))
        f.write("\n")
    vig = _vignette(TH, TW)
    cv2.imwrite(os.path.join(scene, "vignette.png"),
                np.round(vig * 65535).astype(np.uint16))

    ps = adv_poses()
    es = adv_exposures()
    with open(os.path.join(scene, "gt_tum.txt"), "w") as f:
        for i, p4 in enumerate(ps):
            f.write(_mat_to_tum(i / 30.0, p4) + "\n")
    # times.txt: "id timestamp exposure_ms" (DatasetReader.h:414).
    with open(os.path.join(scene, "times.txt"), "w") as f:
        for i, e in enumerate(es):
            f.write(f"{i:06d} {i / 30.0:.6f} {10.0 * e:.6f}\n")

    # cv2's BGR2GRAY weights — the reader's gray path (data/reader.py:120).
    GW = np.array([0.299, 0.587, 0.114])
    for i, (p4, e) in enumerate(zip(ps, es)):
        rgb, _ = render(p4, w=TW, h=TH, fx=TFX, fy=TFY, cx=TCX, cy=TCY,
                        boxes=ADV_BOXES, ss=3)
        # The sensor model must be EXACTLY invertible by the gray-domain
        # pcalib the reader applies (LUT on cv2 gray): encode the LUMA with
        # G and scale the RGB so its gray equals G(luma) bit-for-bit —
        # per-channel gamma would make gray(G(x)) != G(gray(x)) on colored
        # content, an inconsistency no pcalib can remove (real pcalibs are
        # calibrated against the sensor's actual gray response).
        lin = rgb.astype(np.float64) * e * vig[..., None]   # e*V*L, < 255
        y_lin = lin @ GW
        y_enc = 255.0 * np.clip(y_lin / 255.0, 0.0, 1.0) ** (1.0 / GAMMA)
        # stored = luma y_enc + chroma (gray-free by construction: GW.d = 0);
        # the chroma gain beta shrinks per pixel so no channel clips —
        # clipping would silently shift the gray.
        d = lin * (y_enc / np.maximum(y_lin, 1e-6))[..., None] \
            - y_enc[..., None]
        with np.errstate(divide="ignore", invalid="ignore"):
            hi = np.where(d > 1e-9, (255.0 - y_enc[..., None]) / d, np.inf)
            lo = np.where(d < -1e-9, -y_enc[..., None] / d, np.inf)
        beta = np.clip(np.minimum(hi, lo).min(-1), 0.0, 1.0)
        stored = y_enc[..., None] + beta[..., None] * d
        u8 = np.clip(np.round(stored), 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(scene, "images", f"{i:06d}.png"),
                    cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_PNG_COMPRESSION, 9])
    tr = sum(float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
             for a, b in zip(ps[1:], ps[:-1]))
    print(f"adv scene: {A_FRAMES} frames {TW}x{TH}, travel {tr:.2f} m, "
          f"exposure [{min(es):.2f}, {max(es):.2f}], vignette min "
          f"{vig.min():.2f} -> {ADV_ROOT}")


def main():
    scene = os.path.join(ROOT, "scene0")
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene, "depths"), exist_ok=True)

    with open(os.path.join(ROOT, "val.txt"), "w") as f:
        f.write("scene0\n")
    with open(os.path.join(scene, "camera.txt"), "w") as f:
        f.write(f"{FX} {FY} {CX} {CY} 0\n{W} {H}\n")
    with open(os.path.join(scene, "depths", "scale.txt"), "w") as f:
        f.write(f"{DEPTH_SCALE}\n")

    ps = poses()
    with open(os.path.join(scene, "poses_gt.txt"), "w") as f:
        for i, p in enumerate(ps):
            vals = " ".join(f"{v:.9f}" for v in p.reshape(-1))
            f.write(f"{i} {vals}\n")
    with open(os.path.join(scene,
                           "tuples_dso_optimization_windows.txt"), "w") as f:
        for s in (0, 2, 3):   # 3 windows of 7 views
            idxs = " ".join(str(s + j) for j in range(7))
            f.write(f"7 {idxs} 1.0\n")

    for i, p in enumerate(ps):
        rgb, depth = render(p)
        cv2.imwrite(os.path.join(scene, "images", f"{i:06d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_PNG_COMPRESSION, 9])
        d16 = np.clip(np.round(depth / DEPTH_SCALE), 0, 65535).astype(
            np.uint16)
        cv2.imwrite(os.path.join(scene, "depths", f"{i:06d}.png"), d16)
        print(f"frame {i}: depth [{depth[depth > 0].min():.2f}, "
              f"{depth.max():.2f}] m")
    print(f"fixture written to {ROOT}")


if __name__ == "__main__":
    import sys
    if "--adv-only" in sys.argv:
        make_adv_scene()
        raise SystemExit(0)
    if "--traj-only" not in sys.argv:
        main()
    make_traj_scene()
    make_adv_scene()
