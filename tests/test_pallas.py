"""Pallas kernel tests (interpret mode on CPU) vs XLA references and torch."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tandem_tpu.ops.pallas_kernels import (edge_kth_value_pallas,
                                           edge_kth_value_xla, K_RANK, WINDOW)


def _torch_reference(depth):
    """The reference's unfold + kthvalue formulation (module.py:1341-1344)."""
    t = torch.from_numpy(depth)[None, None]
    w2 = WINDOW // 2
    dw = F.unfold(t, kernel_size=(WINDOW, WINDOW), padding=w2)  # (1, 25, HW)
    m = (WINDOW * WINDOW) // 2
    edge = torch.abs(dw - dw[:, m:m + 1, :])
    kth, _ = torch.kthvalue(edge, k=K_RANK, dim=1)
    return kth.reshape(depth.shape).numpy()


def test_xla_reference_matches_torch(rng):
    depth = rng.rand(32, 48).astype(np.float32) * 3
    ours = np.asarray(edge_kth_value_xla(jnp.asarray(depth)))
    theirs = _torch_reference(depth)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_pallas_kernel_matches_xla(rng):
    depth = rng.rand(128, 128).astype(np.float32) * 3
    out_p = np.asarray(edge_kth_value_pallas(jnp.asarray(depth),
                                             block_rows=32, interpret=True))
    out_x = np.asarray(edge_kth_value_xla(jnp.asarray(depth)))
    np.testing.assert_allclose(out_p, out_x, atol=1e-6)


def test_pallas_kernel_with_ties(rng):
    # Constant depth -> all-zero diffs in the interior (ties must resolve to
    # the value, not garbage); borders see the zero padding like the torch
    # unfold reference does.
    depth = jnp.full((64, 64), 2.0)
    out = np.asarray(edge_kth_value_pallas(depth, block_rows=32,
                                           interpret=True))
    np.testing.assert_allclose(out[2:-2, 2:-2], 0.0, atol=1e-7)
    ref = np.asarray(edge_kth_value_xla(depth))
    np.testing.assert_allclose(out, ref, atol=1e-7)
