"""Checkpoint save/load: orbax for native checkpoints + torch import.

Replaces the reference's PL ModelCheckpoint + load_ckpt
(cva_mvsnet/train.py:118, models/utils/load_ckpt.py:36-48): orbax handles our
own checkpoints (params + batch_stats + opt_state + step); ``load_any`` also
accepts a reference torch checkpoint (PL .ckpt with 'state_dict', or a plain
state_dict) and converts it through models/torch_convert.py — the dual-format
loader used for parity testing against published weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    import orbax.checkpoint as ocp
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": jnp.asarray(state.step)}
    # Host-local copy WITHOUT any collective: the caller rank-gates
    # multi-host saves (cli/tandem_train.py), and both orbax and
    # jax.device_get turn a multi-process global array into a cross-host
    # allgather — a collective only rank 0 would enter, deadlocking the
    # other ranks' Gloo/ICI context (observed: GetKeyValue() 30 s timeout).
    # Train state is replicated (out_specs=P()), so every process holds the
    # full value in its first addressable shard.
    def _host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.sharding.is_fully_replicated, (
                "rank-gated checkpoint save needs replicated state")
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    payload = jax.tree_util.tree_map(_host, payload)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": jnp.asarray(state.step)}
    restored = ckptr.restore(os.path.abspath(path), template)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def load_torch_weights(path: str, view_aggregation: bool = True) -> Dict:
    """Import a reference torch checkpoint -> flax variables dict."""
    import torch

    from ..models.torch_convert import convert_state_dict

    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
        sd = payload.get("state_dict", payload)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
    except RuntimeError:
        # TorchScript archive (the reference's exported model.pt): recover
        # the trained weights via frozen_extract.
        from ..models.frozen_extract import extract_reference_weights
        sd = extract_reference_weights(path)
    return jax.tree_util.tree_map(
        jnp.asarray, convert_state_dict(sd, view_aggregation=view_aggregation))


def load_any(path: str, state=None, view_aggregation: bool = True):
    """Multi-format loader: orbax dir -> TrainState; .pkl variables file (the
    exported deployable unit) -> variables; torch .ckpt -> converted
    variables (load_ckpt.py dual-format behaviour)."""
    if os.path.isdir(path):
        assert state is not None
        return load_checkpoint(path, state)
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            return jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
    return load_torch_weights(path, view_aggregation)
