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


def render(c2w):
    """Ray-cast the analytic scene: returns (rgb u8 HxWx3, depth f32 HxW)."""
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    dirs_cam = np.stack([(us - CX) / FX, (vs - CY) / FY,
                         np.ones_like(us)], -1)
    R, t = c2w[:3, :3], c2w[:3, 3]
    dirs = dirs_cam @ R.T
    tmin = np.full((H, W), np.inf)
    for n, d in PLANES:
        denom = dirs @ n
        ti = (d - t @ n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        ti = np.where((denom > 1e-9) & (ti > 0.05), ti, np.inf)
        tmin = np.minimum(tmin, ti)
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
    main()
