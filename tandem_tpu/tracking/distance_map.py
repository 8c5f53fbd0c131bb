"""Coarse distance map for spatially-spread point activation.

Parity target: CoarseDistanceMap (tandem/src/FullSystem/CoarseTracker.h:
168-212, makeDistanceMap/growDistBFS CoarseTracker.cpp:1253,1294): a BFS
distance transform over projected active points at pyramid level 1, used to
prefer activating candidates far from existing points.

TPU re-design: the sequential BFS becomes an iterated 4-neighbour min-plus
relaxation (jitted scan) — identical result (L1 distance transform), fully
vectorized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnums=(1,))
def distance_map(occupied, max_dist: int = 40):
    """:param occupied: (H, W) bool — pixels containing an active point
    :return: (H, W) int32 L1 distance to the nearest occupied pixel,
        clamped at max_dist."""
    H, W = occupied.shape
    d0 = jnp.where(occupied, 0, max_dist).astype(jnp.int32)

    def step(d, _):
        up = jnp.concatenate([d[1:], d[-1:]], 0)
        down = jnp.concatenate([d[:1], d[:-1]], 0)
        left = jnp.concatenate([d[:, 1:], d[:, -1:]], 1)
        right = jnp.concatenate([d[:, :1], d[:, :-1]], 1)
        nbr = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.minimum(d, nbr + 1), None

    d, _ = lax.scan(step, d0, None, length=max_dist)
    return d


def select_spread(candidate_mask, occupied, want: int, max_dist: int = 40):
    """Pick up to ``want`` candidates preferring large distance from existing
    points (activatePointsMT spacing policy, FullSystem.cpp:706-)."""
    import numpy as np
    d = np.asarray(distance_map(jnp.asarray(occupied), max_dist))
    ys, xs = np.nonzero(np.asarray(candidate_mask))
    if len(ys) == 0:
        return np.zeros((0, 2), np.int32)
    scores = d[ys, xs]
    order = np.argsort(-scores, kind="stable")[:want]
    return np.stack([xs[order], ys[order]], -1).astype(np.int32)
