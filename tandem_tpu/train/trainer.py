"""Data-parallel trainer over a jax.sharding.Mesh.

Replaces the reference's PyTorch-Lightning DDP/NCCL/SLURM stack
(cva_mvsnet/train.py:62-89, utils.py:23-37,419-460): the batch is sharded over
a 1-D ``data`` mesh axis; gradient all-reduce is implicit in the sharded jit;
metric reductions are jnp.means of sharded arrays (XLA inserts the psum over
ICI). Multi-host runs initialize with jax.distributed and the same code.

LR schedule parity: linear decay from LR to LR*final_fraction over total
steps (tandem.py:87-94), warmup of int(500 * 16/batch) steps scaled by world
size (tandem.py:82-85), LR itself scaled by world size when
LR_DDP_SCALE_WITH_BATCH_SIZE (train.py:70-72).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cva_mvsnet import CvaMVSNet, outputs_to_dict
from ..models.losses import compute_loss
from ..models.metrics import eval_errors


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats, opt_state=new_opt)


def lr_schedule(base_lr: float, total_steps: int, final_fraction: float,
                warmup_steps: int = 0, warmup_factor: float = 1.0 / 3):
    def fn(step):
        frac = jnp.minimum(step / jnp.maximum(total_steps - 1, 1), 1.0)
        factor = 1.0 * (1 - frac) + final_fraction * frac
        if warmup_steps > 0:
            alpha = jnp.minimum(step / warmup_steps, 1.0)
            wfac = warmup_factor * (1 - alpha) + alpha
            factor = factor * jnp.where(step < warmup_steps, wfac, 1.0)
        return base_lr * factor
    return fn


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None and n_devices > 0:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"Requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible (set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N for "
                f"virtual CPU meshes).")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def create_train_state(config: Dict[str, Any], rng_key, total_steps: int,
                       world_size: int = 1,
                       example_shape: Tuple[int, int, int, int] = (1, 7, 480, 640)):
    model = CvaMVSNet(
        depth_num=tuple(config["MODEL.DEPTH_NUM"]),
        depth_interval_ratio=tuple(config["MODEL.DEPTH_INTERVAL_RATIO"]),
        feature_net_base_channels=config["MODEL.FEATURE_NET_BASE_CHANNELS"],
        cost_volume_base_channels=tuple(config["MODEL.COST_VOLUME_BASE_CHANNELS"]),
        view_aggregation=config["MODEL.VIEW_AGGREGATION"],
        conv2d_normalization=config["MODEL.CONV2D_NORMALIZATION"],
        conv3d_normalization=config["MODEL.CONV3D_NORMALIZATION"],
        dtype=jnp.bfloat16 if config.get("TRAIN.COMPUTE_DTYPE") == "bfloat16"
        else jnp.float32)

    B, V, H, W = example_shape
    img = jnp.zeros((B, V, 3, H, W), jnp.float32)
    Ks = tuple(jnp.broadcast_to(jnp.eye(3) * s, (B, 3, 3))
               for s in (100.0, 200.0, 400.0))
    c2w = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
    variables = model.init(rng_key, img, Ks, c2w,
                           jnp.full((B,), 0.5), jnp.full((B,), 10.0),
                           train=True)

    base_lr = config["TRAIN.LR"]
    if config.get("TRAIN.LR_DDP_SCALE_WITH_BATCH_SIZE", True):
        base_lr = base_lr * world_size
    batch_size = config["TRAIN.BATCH_SIZE"] * world_size
    warmup = int(500 * (16 / batch_size))
    sched = lr_schedule(base_lr, total_steps,
                        config["TRAIN.LR_SCHEDULE_FINAL_FRACTION"],
                        warmup_steps=warmup)
    tx = optax.adam(sched)

    params = variables["params"]
    return model, TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), tx=tx)


def _stage_K(batch, stage):
    """Per-stage shared intrinsics: datasets stack one K per view
    (B, V, 3, 3) but all views share the camera (datasets.py cam_stack);
    the model takes the shared (B, 3, 3)."""
    K = batch["intrinsics"][stage]["K"]
    return K[:, 0] if K.ndim == 4 else K


def _loss_fn(params, batch_stats, model, batch, loss_cfg):
    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["image"],
        tuple(_stage_K(batch, s) for s in ("stage1", "stage2", "stage3")),
        batch["cam_to_world"], batch["depth_min"], batch["depth_max"],
        train=True, mutable=["batch_stats"])
    out = outputs_to_dict(outputs)
    loss, losses = compute_loss(out, batch, **loss_cfg)
    return loss, (losses, out, mutated["batch_stats"])


def make_train_step(model: CvaMVSNet, config: Dict[str, Any],
                    mesh: Optional[Mesh] = None,
                    with_metrics: bool = True,
                    with_outputs: bool = False) -> Callable:
    """Build the jitted train step.

    ``with_outputs`` adds the per-stage model outputs (device-resident, lazy)
    under metrics["_outputs"] so the caller can emit TB image summaries at
    log intervals without a second forward pass.
    """
    loss_cfg = dict(weights=tuple(config["LOSS.STAGE_WEIGHTS"]),
                    loss_terms=tuple(config["LOSS.TERMS"]),
                    term_weights=tuple(config["LOSS.TERM_WEIGHTS"]))

    sam_rho = float(config.get("TRAIN.SAM_RHO", 0.05))
    use_sam = bool(config.get("TRAIN.SAM", False))

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (losses, out, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, model, batch, loss_cfg)
        if use_sam:
            # SAM two-step (reference module.py:1568-1629, adaptive=False):
            # first_step climbs e_w = rho * g / ||g||, the closure re-runs the
            # full forward-backward there, second_step restores the base
            # params and applies the perturbed-point gradient. The loss/
            # metrics reported stay those of the base point; batch_stats
            # follow the last forward pass (like the torch closure, whose BN
            # running stats are updated by both passes — last one wins).
            from .utils import sam_perturb
            perturbed = sam_perturb(state.params, grads, rho=sam_rho)
            (_, (_, _, new_stats)), grads = grad_fn(
                perturbed, state.batch_stats, model, batch, loss_cfg)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss": loss, **losses}
        if with_metrics:
            errs = eval_errors(out, batch)
            metrics.update({f"{s}/{k}": v for s, d in errs.items()
                            for k, v in d.items()})
        if with_outputs:
            metrics["_outputs"] = out
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    # Batch sharded over 'data'; state replicated; gradient psum implicit.
    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data"))

    def shard_leaf(x):
        return batch_sharding if getattr(x, "ndim", 0) >= 1 else replicated

    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(replicated,
                                 jax.tree_util.tree_map(lambda _: batch_sharding,
                                                        _example_batch_spec())),
                   out_shardings=(replicated, replicated))


def _example_batch_spec():
    # Structure-only pytree describing the batch layout used for sharding.
    return {
        "image": 0,
        "cam_to_world": 0,
        "depth_min": 0,
        "depth_max": 0,
        "intrinsics": {s: {"K": 0} for s in ("stage1", "stage2", "stage3")},
        "depth": {s: 0 for s in ("stage1", "stage2", "stage3")},
        "mask": {s: 0 for s in ("stage1", "stage2", "stage3")},
    }


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over 'data'.

    Works for multi-process meshes too (the multi-host DCN path,
    cli/tandem_train.py TRAIN.DEVICE=multihost): every process passes the
    same GLOBAL batch — the reference's debug-ddp discipline
    (cva_mvsnet/train.py:75-89) — and only its addressable shards are
    materialized via jax.make_array_from_callback.
    """
    sharding = NamedSharding(mesh, P("data"))
    spec = _example_batch_spec()
    multiproc = jax.process_count() > 1

    def put(path_val, template):
        if isinstance(template, dict):
            return {k: put(path_val[k], template[k]) for k in template}
        arr = np.asarray(path_val)
        if multiproc:
            return jax.make_array_from_callback(arr.shape, sharding,
                                                lambda idx: arr[idx])
        return jax.device_put(jnp.asarray(arr), sharding)
    return put(batch, spec)


def host_local(tree):
    """Fetch a pytree of REPLICATED arrays to host numpy without any
    collective. ``jax.device_get`` on a multi-process global array issues a
    cross-host allgather (a Gloo/ICI collective every rank must enter);
    replicated values are already fully present in each process's first
    addressable shard, so this is a pure local copy — safe to call from a
    rank-gated branch and free of cross-host traffic."""
    def _host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.sharding.is_fully_replicated, (
                "host_local is only valid for replicated arrays")
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    return jax.tree_util.tree_map(_host, tree)


def make_eval_step(model: CvaMVSNet) -> Callable:
    def step(variables, batch):
        outputs = model.apply(
            variables, batch["image"],
            tuple(_stage_K(batch, s) for s in ("stage1", "stage2", "stage3")),
            batch["cam_to_world"], batch["depth_min"], batch["depth_max"],
            train=False)
        out = outputs_to_dict(outputs)
        return out, eval_errors(out, batch, keep_batch=True)
    return jax.jit(step)
