"""Small fixed-size linear algebra that stays on the TPU fast path.

XLA lowers jnp.linalg.{inv, solve} through LU custom calls that cost tens of
milliseconds even for a single 4x4 on TPU. Every in-jit solve in this
framework goes through the closed-form / unrolled routines here instead:

- inv3x3: adjugate inverse (intrinsics etc.)
- invert_pixel_projection: (K [R|t]; 0 0 0 1)^-1 without any solve
- solve_psd: unrolled Cholesky solve for small SPD systems (LM/GN steps)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(A):
    """Closed-form 3x3 inverse via the adjugate. A: (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    row0 = jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1)
    row1 = jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1)
    row2 = jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


def invert_pixel_projection(K, cam_to_world):
    """Inverse of the 4x4 world->pixel matrix [[K (R|t)], [0 0 0 1]] where
    (R|t) is the world-to-cam transform = inverse(cam_to_world):
    result = cam_to_world @ diag(K^-1, 1), all closed-form.

    K: (..., 3, 3); cam_to_world: (..., 4, 4) -> (..., 4, 4)
    """
    Kinv = inv3x3(K)
    top = jnp.einsum("...ij,...jk->...ik", cam_to_world[..., :3, :3], Kinv)
    trans = cam_to_world[..., :3, 3:]
    upper = jnp.concatenate([top, trans], -1)  # (..., 3, 4)
    bottom = cam_to_world[..., 3:4, :]
    return jnp.concatenate([upper, bottom], -2)


def solve_gauss_jordan(A, b, n: int):
    """Solve A x = b via Gauss-Jordan elimination with VECTOR row operations:
    n pivot steps of (n, n+1)-shaped elementwise ops instead of ~n^2/2
    sequential scalar ops — ~5x shallower dependency chain on TPU, which
    matters inside tight LM while_loops. No pivoting (A is SPD + damped)."""
    M = jnp.concatenate([A, b[:, None]], axis=1)  # (n, n+1)
    for j in range(n):
        pivot = M[j, j]
        row_j = M[j] / jnp.where(jnp.abs(pivot) > 1e-30, pivot, 1e-30)
        factors = M[:, j].at[j].set(0.0)
        M = M - factors[:, None] * row_j[None, :]
        M = M.at[j].set(row_j)
    return M[:, n]


def solve_gauss_jordan_batched(A, b, n: int):
    """Batched Gauss-Jordan solve: A (B, n, n), b (B, n) -> (B, n). Same
    vector row operations as solve_gauss_jordan with a leading batch dim
    (used for the multi-hypothesis tracker retries)."""
    M = jnp.concatenate([A, b[..., None]], axis=-1)  # (B, n, n+1)
    for j in range(n):
        pivot = M[:, j, j]
        safe = jnp.where(jnp.abs(pivot) > 1e-30, pivot, 1e-30)
        row_j = M[:, j] / safe[:, None]               # (B, n+1)
        factors = M[:, :, j].at[:, j].set(0.0)        # (B, n)
        M = M - factors[..., None] * row_j[:, None, :]
        M = M.at[:, j].set(row_j)
    return M[..., n]


def cholesky_small(A, n: int):
    """Unrolled Cholesky factor of an (n, n) SPD matrix (static small n)."""
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[j, j] - jnp.sum(L[j, :j] ** 2) if j > 0 else A[j, j]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        L = L.at[j, j].set(d)
        if j + 1 < n:
            if j > 0:
                off = A[j + 1:, j] - L[j + 1:, :j] @ L[j, :j]
            else:
                off = A[j + 1:, j]
            L = L.at[j + 1:, j].set(off / d)
    return L


def solve_psd(A, b):
    """Solve A x = b for SPD A via unrolled Cholesky. A: (n, n), b: (n,).
    n is static and should be modest (<= ~96)."""
    n = A.shape[0]
    L = cholesky_small(A, n)
    # Forward substitution L y = b
    y = jnp.zeros_like(b)
    for i in range(n):
        acc = b[i] - (L[i, :i] @ y[:i] if i > 0 else 0.0)
        y = y.at[i].set(acc / L[i, i])
    # Backward substitution L^T x = y
    x = jnp.zeros_like(b)
    for i in range(n - 1, -1, -1):
        acc = y[i] - (L[i + 1:, i] @ x[i + 1:] if i + 1 < n else 0.0)
        x = x.at[i].set(acc / L[i, i])
    return x


def inv_psd_small(A, n: int):
    """Inverse of a small SPD matrix via Gauss-Jordan on [A | I] (row-
    parallel vector ops, shallow dependency chain)."""
    M = jnp.concatenate([A, jnp.eye(n, dtype=A.dtype)], axis=1)  # (n, 2n)
    for j in range(n):
        pivot = M[j, j]
        row_j = M[j] / jnp.where(jnp.abs(pivot) > 1e-30, pivot, 1e-30)
        factors = M[:, j].at[j].set(0.0)
        M = M - factors[:, None] * row_j[None, :]
        M = M.at[j].set(row_j)
    return M[:, n:]
