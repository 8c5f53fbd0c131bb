"""Immature-point epipolar tracing and activation refinement.

Re-design of DSO's ImmaturePoint (tandem/src/FullSystem/ImmaturePoint.h:46,
traceOn, and the GN activation in FullSystemOptPoint.cpp): every candidate
point keeps an inverse-depth interval [id_min, id_max]; each new frame
narrows the interval by searching along the epipolar segment with the
8-pixel pattern SSD, then a few Gauss-Newton steps refine the best match.

TPU design: ALL points trace in one jitted call — the discrete search is a
fixed-size lax.scan over S samples along each point's segment (out-of-range
samples masked), so shapes stay static regardless of the true search length.
Status codes follow the reference state machine (GOOD / OOB / OUTLIER /
SKIPPED on tiny baselines).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.se3 import se3_inverse
from .ba import PATTERN, _bilinear

STATUS_UNINIT = 0
STATUS_GOOD = 1
STATUS_OOB = 2
STATUS_OUTLIER = 3
STATUS_SKIPPED = 4

N_SAMPLES = 32     # discrete epipolar samples per trace
GN_ITERS = 3
# Pixel-space match uncertainty mapped back to the idepth interval each
# trace (DSO errorInPixel, ImmaturePoint.cpp traceOn: interval = match
# +- errorInPixel px along the epipolar line). This is what makes maturity
# BASELINE-AWARE: a 1.5 px epipolar segment maps +-0.75 px to a huge idepth
# range, so small-parallax candidates stay immature instead of "converging"
# by the fixed-fraction shrink of the old design (which activated points
# whose idepth was constrained to +-50% after two 1 cm-baseline traces).
ERROR_IN_PIXEL = 0.75
MIN_TRACE_QUALITY = 3.0        # setting_minTraceQuality (settings.cpp)
MIN_TRACE_TEST_DIST = 2.0      # px; setting_minTraceTestRadius
MAX_PIXEL_INTERVAL = 8.0       # canActivate lastTracePixelInterval < 8


class ImmaturePoints(NamedTuple):
    uv: jnp.ndarray       # (N, 2) pixel in host frame
    id_min: jnp.ndarray   # (N,)
    id_max: jnp.ndarray   # (N,)
    color: jnp.ndarray    # (N, 8) host pattern intensities
    status: jnp.ndarray   # (N,) int32
    valid: jnp.ndarray    # (N,) bool
    quality: jnp.ndarray  # (N,) secondBest/best SSD of the last wide trace
    last_px: jnp.ndarray  # (N,) epipolar px length of the last real search


@partial(jax.jit, static_argnums=(2, 3))
def make_immature(uv, host_img, id_min=0.01, id_max=10.0):
    """Create immature points at integer pixels uv (N, 2) from host image.
    Jitted: host-side eager gathers both run slowly and (if their results are
    pulled to numpy) poison remote-backend dispatch for the whole process."""
    N = uv.shape[0]
    u = uv[:, 0:1] + PATTERN[None, :, 0]
    v = uv[:, 1:2] + PATTERN[None, :, 1]
    # One flat gather (vmapped gathers lower to slow per-batch gathers)
    color = _bilinear(host_img, u.reshape(-1), v.reshape(-1)).reshape(N, 8)
    return ImmaturePoints(
        uv=uv.astype(jnp.float32),
        id_min=jnp.full((N,), id_min),
        id_max=jnp.full((N,), id_max),
        color=color,
        status=jnp.full((N,), STATUS_UNINIT, jnp.int32),
        valid=jnp.ones((N,), jnp.bool_),
        quality=jnp.zeros((N,)),
        last_px=jnp.full((N,), 1e9),
    )


@jax.jit
def trace_points(pts: ImmaturePoints, host_c2w, target_c2w, target_img, K):
    """Narrow each point's inverse-depth interval against one target frame.

    :param K: (fx, fy, cx, cy)
    :return: updated ImmaturePoints
    """
    fx, fy, cx, cy = K
    H, W = target_img.shape
    T_th = se3_inverse(target_c2w) @ host_c2w
    R, t = T_th[:3, :3], T_th[:3, 3]

    ray = jnp.stack([(pts.uv[:, 0] - cx) / fx, (pts.uv[:, 1] - cy) / fy,
                     jnp.ones_like(pts.uv[:, 0])], -1)  # (N, 3)
    Rr = ray @ R.T                                      # (N, 3)

    def project(idep):
        q = Rr + t[None] * idep[:, None]
        qz = jnp.maximum(q[:, 2], 1e-6)
        return (fx * q[:, 0] / qz + cx, fy * q[:, 1] / qz + cy,
                q[:, 2] > 1e-6)

    # Segment endpoints at id_min / id_max
    px_min, py_min, ok_min = project(pts.id_min)
    px_max, py_max, ok_max = project(pts.id_max)
    seg = jnp.stack([px_min - px_max, py_min - py_max], -1)
    seg_len = jnp.linalg.norm(seg, axis=-1)
    # Tiny baseline -> skip (ImmaturePoint traceOn SKIPPED)
    skipped = seg_len < 1.5

    ids = jnp.linspace(0.0, 1.0, N_SAMPLES)[None, :]
    id_samples = pts.id_max[:, None] + ids * (pts.id_min - pts.id_max)[:, None]

    def ssd_at(idep_flat):
        q = Rr[:, None, :] + t[None, None, :] * idep_flat[:, :, None]
        qz = jnp.maximum(q[..., 2], 1e-6)
        px = fx * q[..., 0] / qz + cx                   # (N, S)
        py = fy * q[..., 1] / qz + cy
        inb = (px > 3) & (px < W - 4) & (py > 3) & (py < H - 4) \
            & (q[..., 2] > 1e-6)
        # pattern SSD
        pu = px[..., None] + PATTERN[None, None, :, 0]  # (N, S, 8)
        pv = py[..., None] + PATTERN[None, None, :, 1]
        Np, S = pu.shape[:2]
        vals = _bilinear(target_img, pu.reshape(-1), pv.reshape(-1)).reshape(
            Np, S, 8)
        ssd = jnp.sum((vals - pts.color[:, None, :]) ** 2, -1)
        return jnp.where(inb, ssd, jnp.inf), px, py, inb

    ssd, px_s, py_s, inb = ssd_at(id_samples)
    best = jnp.argmin(ssd, axis=1)                      # (N,)
    best_ssd = jnp.take_along_axis(ssd, best[:, None], 1)[:, 0]
    any_inb = jnp.any(jnp.isfinite(ssd), axis=1)

    # Energy threshold (DSO: setting_trace_stepsize etc.; threshold on mean
    # per-pixel error)
    outlier = best_ssd > (12.0 ** 2) * 8
    oob = ~any_inb

    # Match ambiguity (traceOn secondmin loop + setting_minTraceQuality):
    # secondBest SSD among samples further than MIN_TRACE_TEST_DIST pixels
    # from the best match. Flat decor regions give quality ~ 1 (the SSD
    # valley is a plateau) — those matches are noise and must never
    # activate. When the searched segment is too short to test (a converged
    # interval), the previous quality is KEPT, like the reference.
    bx = jnp.take_along_axis(px_s, best[:, None], 1)
    by = jnp.take_along_axis(py_s, best[:, None], 1)
    far = (jnp.square(px_s - bx) + jnp.square(py_s - by)
           > MIN_TRACE_TEST_DIST ** 2)
    second = jnp.min(jnp.where(far, ssd, jnp.inf), axis=1)
    has_second = jnp.isfinite(second)
    quality = jnp.where(has_second & ~skipped & ~oob,
                        second / jnp.maximum(best_ssd, 1e-6), pts.quality)

    # Interval update: the match +- ERROR_IN_PIXEL pixels mapped back to
    # idepth through the CURRENT segment (DSO errorInPixel semantics) —
    # never narrower than +-1 discrete sample (search quantization).
    step = 1.0 / (N_SAMPLES - 1)
    radius = jnp.maximum(ERROR_IN_PIXEL / jnp.maximum(seg_len, 1e-6), step)
    frac = best.astype(jnp.float32) * step
    lo = jnp.clip(frac - radius, 0.0, 1.0)
    hi = jnp.clip(frac + radius, 0.0, 1.0)
    new_max = pts.id_max + lo * (pts.id_min - pts.id_max)   # id at lo
    new_min = pts.id_max + hi * (pts.id_min - pts.id_max)
    # (id decreases along the segment from id_max to id_min endpoint naming)
    id_min_new = jnp.minimum(new_min, new_max)
    id_max_new = jnp.maximum(new_min, new_max)

    good = pts.valid & ~skipped & ~oob & ~outlier
    # SKIPPED (tiny epipolar baseline) keeps the previous interval AND the
    # previous status — the point is merely unobservable this frame, exactly
    # like the reference's IPS_SKIPPED handling (ImmaturePoint traceOn).
    status = jnp.where(oob, STATUS_OOB,
                       jnp.where(outlier, STATUS_OUTLIER, STATUS_GOOD))
    status = jnp.where(skipped, pts.status, status)
    return pts._replace(
        id_min=jnp.where(good, id_min_new, pts.id_min),
        id_max=jnp.where(good, id_max_new, pts.id_max),
        status=jnp.where(pts.valid, status, pts.status),
        quality=jnp.where(pts.valid, quality, pts.quality),
        # lastTracePixelInterval: length of the segment actually searched
        # this trace (kept through SKIPPED frames like the reference).
        last_px=jnp.where(good, seg_len, pts.last_px))


@jax.jit
def activate_points(pts: ImmaturePoints, host_c2w, target_c2w, target_img, K):
    """GN refinement of idepth at the interval centre against one target
    (FullSystemOptPoint.cpp optimizeImmaturePoint analogue).

    :return: (idepth (N,), ok (N,) bool)
    """
    fx, fy, cx, cy = K
    H, W = target_img.shape
    T_th = se3_inverse(target_c2w) @ host_c2w
    R, t = T_th[:3, :3], T_th[:3, 3]
    ray = jnp.stack([(pts.uv[:, 0] - cx) / fx, (pts.uv[:, 1] - cy) / fy,
                     jnp.ones_like(pts.uv[:, 0])], -1)
    Rr = ray @ R.T

    idep0 = 0.5 * (pts.id_min + pts.id_max)

    def energy(idep):
        qq = Rr + t[None] * idep[:, None]
        qz = jnp.maximum(qq[:, 2], 1e-6)
        px = fx * qq[:, 0] / qz + cx
        py = fy * qq[:, 1] / qz + cy
        pu = px[:, None] + PATTERN[None, :, 0]
        pv = py[:, None] + PATTERN[None, :, 1]
        vals = _bilinear(target_img, pu.reshape(-1), pv.reshape(-1)).reshape(
            -1, 8)
        r = vals - pts.color
        inb = (px > 3) & (px < W - 4) & (py > 3) & (py < H - 4)
        return r, inb

    def gn_step(idep, _):
        r, inb = energy(idep)
        # Finite-difference scalar Jacobian of the 8-vector residual
        eps = 1e-4
        r2, _ = energy(idep + eps)
        Jd = (r2 - r) / eps                              # (N, 8)
        H_ = jnp.sum(Jd * Jd, -1) + 1e-6
        g_ = jnp.sum(Jd * r, -1)
        step = -g_ / H_
        new = jnp.clip(idep + step, 1e-4, 1e3)
        return jnp.where(inb, new, idep), None

    idep, _ = lax.scan(gn_step, idep0, None, length=GN_ITERS)
    r, inb = energy(idep)
    e = jnp.sum(r * r, -1)
    # Maturity (DSO canActivate, FullSystem.cpp:778-785): every status
    # EXCEPT outlier may activate — including points whose LAST trace was
    # skipped for tiny baseline (IPS_SKIPPED) or left the trace target
    # (IPS_OOB); what gates maturity is the short accumulated search
    # interval (lastTracePixelInterval < 8 px, which only happens once
    # real baseline has accumulated) and match unambiguity (quality >
    # setting_minTraceQuality — rejects plateau matches from flat decor).
    # Requiring GOOD-on-last-trace instead starves the map during
    # rotation-heavy segments where most traces are SKIPPED (measured on
    # the adversarial fixture: window active points 840 -> 114 over one
    # pan, then tracking lost). The GN refine polishes idepth to
    # sub-pixel; its in-bounds + energy checks subsume the reference's
    # projection-in-newest-frame test.
    ok = pts.valid & inb & (e < (12.0 ** 2) * 8) & \
        (pts.status != STATUS_OUTLIER) & (pts.status != STATUS_UNINIT) & \
        (pts.quality > MIN_TRACE_QUALITY) & \
        (pts.last_px < MAX_PIXEL_INTERVAL) & (idep > 1e-3)
    return idep, ok
