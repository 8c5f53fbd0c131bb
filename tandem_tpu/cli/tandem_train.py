"""Training CLI — the reference train.py equivalent on a TPU mesh.

Data-parallel training of CVA-MVSNet: batch sharded over the 'data' mesh
axis, implicit gradient all-reduce, LR scaled by world size
(train.py:70-72), linear-decay schedule with warmup (tandem.py:56-96),
per-epoch orbax checkpoints (ModelCheckpoint equivalent), TB logging with
sample-scaled x-axis.

Usage:
  python -m tandem_tpu.cli.tandem_train OUT_DIR --config CFG.yaml \
      [--pretrained CKPT] [KEY VALUE]...
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("out_dir")
parser.add_argument("--config", default=None)
parser.add_argument("--pretrained", default=None)
parser.add_argument("overrides", nargs="*", default=[])


def main(args):
    import jax
    import jax.numpy as jnp

    from .. import config as cfg
    from ..data.augment import augment_batch
    from ..data.replica import MVSDataset, make_batches
    from ..train.checkpoint import (load_any, load_torch_weights,
                                    save_checkpoint)
    from ..train.tb_logger import TBLogger
    from ..train.trainer import (create_train_state, host_local, make_mesh,
                                 make_train_step, shard_batch)

    config = cfg.default()
    if args.config:
        cfg.merge_from_file(config, args.config)
    if args.overrides:
        cfg.merge_from_list(config, list(args.overrides))

    os.makedirs(args.out_dir, exist_ok=True)
    if os.listdir(args.out_dir):
        # DDP-safety parity: out_dir must be empty (utils.py:229-238)
        existing = [f for f in os.listdir(args.out_dir)
                    if not f.startswith(".")]
        assert not existing, f"Output dir {args.out_dir} is not empty."

    np.random.seed(config["TRAIN.SEED"])

    device_mode = config["TRAIN.DEVICE"]
    if device_mode == "multihost":
        # Multi-host data parallelism: jax.distributed discovers the
        # coordinator from the environment (SLURM/TPU pod metadata) — the
        # reference's slurm_ddp_setup + NCCL init equivalent
        # (cva_mvsnet/utils.py:23-37); collectives ride ICI within a slice
        # and DCN across slices. TANDEM_COORDINATOR/TANDEM_NUM_PROCESSES/
        # TANDEM_PROCESS_ID override auto-detection for manual localhost
        # launches — the reference's debug-ddp MASTER_ADDR/RANK trick
        # (train.py:75-89, configs/default.yaml:88-91).
        coord = os.environ.get("TANDEM_COORDINATOR")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["TANDEM_NUM_PROCESSES"]),
                process_id=int(os.environ["TANDEM_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
        mesh = make_mesh()
        world = mesh.devices.size
    elif device_mode == "mesh":
        mesh = make_mesh()
        world = mesh.devices.size
    else:
        mesh = None
        world = 1

    ds = MVSDataset(config["DATA.ROOT_DIR"], "train",
                    pose_ext=config["DATA.POSE_EXT"],
                    height=config["DATA.IMG_HEIGHT"],
                    width=config["DATA.IMG_WIDTH"],
                    tuples_ext=config["DATA.TUPLES_EXT"],
                    ignore_pose_scale=config["DATA.IGNORE_POSE_SCALE"],
                    tuples_default_flag=config["DATA.TUPLES_DEFAULT_FLAG"],
                    tuples_default_frame_num=config["DATA.TUPLES_DEFAULT_FRAME_NUM"],
                    tuples_default_frame_dist=config["DATA.TUPLES_DEFAULT_FRAME_DIST"],
                    depth_min=config["DATA.DEPTH_MIN"],
                    depth_max=config["DATA.DEPTH_MAX"])

    batch_size = config["TRAIN.BATCH_SIZE"] * world
    steps_per_epoch = len(ds) // batch_size
    total_steps = config["TRAIN.EPOCHS"] * steps_per_epoch

    model, state = create_train_state(
        config, jax.random.PRNGKey(config["TRAIN.SEED"]), total_steps,
        world_size=world,
        example_shape=(1, 7, config["DATA.IMG_HEIGHT"],
                       config["DATA.IMG_WIDTH"]))
    if args.pretrained:
        loaded = load_any(args.pretrained, state,
                          view_aggregation=config["MODEL.VIEW_AGGREGATION"])
        if isinstance(loaded, dict):
            state = state.replace(params=loaded["params"],
                                  batch_stats=loaded.get("batch_stats",
                                                         state.batch_stats))
        else:
            state = loaded

    summaries = tuple(config.get("IO.SUMMARIES") or ())
    step_fn = make_train_step(model, config, mesh=mesh,
                              with_outputs=bool(summaries))
    rank0 = jax.process_index() == 0
    # Multi-host: every process gets the SAME out_dir (shared storage, like
    # a pod's GCS run dir); only rank 0 writes TB events (rank_zero_only).
    logger = TBLogger(args.out_dir, samples_per_step=batch_size,
                      enabled=rank0)
    aug_key = jax.random.PRNGKey(config["TRAIN.SEED"] + 1)

    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    global_step = 0
    compiled_step = None
    max_steps = int(config.get("TRAIN.MAX_STEPS", 0) or 0)
    done = False
    for epoch in range(config["TRAIN.EPOCHS"]):
        if done:
            break
        for batch in make_batches(ds, batch_size,
                                  shuffle=config["TRAIN.SHUFFLE"],
                                  drop_last=config["TRAIN.DROP_LAST"],
                                  seed=config["TRAIN.SEED"] + epoch,
                                  num_workers=config["TRAIN.NUM_WORKERS"]):
            if config["AUG.ANY"]:
                aug_key, k = jax.random.split(aug_key)
                batch = jax.device_get(augment_batch(
                    k, {"image": jnp.asarray(batch["image"]),
                        **{kk: batch[kk] for kk in ()}},
                    same_on_views=config["AUG.SAME_ON_VIEWS"],
                    color_jitter_params=config["AUG.COLOR_JITTER"],
                    motion_blur_params=config["AUG.MOTION_BLUR"])) | {
                    kk: vv for kk, vv in batch.items() if kk != "image"}
            if mesh is not None:
                with mesh:
                    sharded = shard_batch(batch, mesh)
                    if device_mode == "multihost" and compiled_step is None:
                        # AOT-compile BEFORE the first collective execution,
                        # then rendezvous at a coordination-service barrier:
                        # XLA:CPU's gloo context init times out after 30 s,
                        # which compile-time skew between ranks would blow.
                        compiled_step = step_fn.lower(state,
                                                      sharded).compile()
                        from jax._src import distributed as _dist
                        _dist.global_state.client.wait_at_barrier(
                            "tandem_train_compiled", 1_800_000)
                    if compiled_step is not None:
                        state, metrics = compiled_step(state, sharded)
                    else:
                        state, metrics = step_fn(state, sharded)
            else:
                dev_batch = jax.tree_util.tree_map(jnp.asarray, {
                    k: batch[k] for k in ("image", "cam_to_world",
                                          "depth_min", "depth_max",
                                          "intrinsics", "depth", "mask")})
                state, metrics = step_fn(state, dev_batch)

            if global_step % config["IO.LOG_INTERVAL"] == 0:
                outputs = metrics.pop("_outputs", None)
                # Scalar metrics are psum-replicated: fetch without a
                # collective (host_local). _outputs stay batch-sharded, so
                # their fetch IS an allgather — fine, every rank logs
                # symmetrically at the same steps.
                m = host_local(metrics)
                if outputs is not None:
                    logger.add_summaries(
                        "train", batch, jax.device_get(outputs), global_step,
                        summaries=summaries)
                loss = float(m["loss"])
                print(f"epoch {epoch} step {global_step} loss {loss:.4f}")
                losses = {k: v for k, v in m.items() if "loss" in k}
                errors = {}
                for k, v in m.items():
                    if "/" in k:
                        s, name = k.split("/", 1)
                        errors.setdefault(s, {})[name] = v
                logger.add_scalars("train", losses, errors, global_step)
            global_step += 1
            if max_steps and global_step >= max_steps:
                done = True
                break

        # EVERY process calls save (orbax's save itself is a cross-process
        # collective: async_checkpointer.py sync_global_processes — a
        # rank-gated call deadlocks the other ranks' Gloo contexts). Orbax
        # rank-gates the actual writes internally; the payload is fetched
        # without collectives (checkpoint.py host-local copy).
        save_checkpoint(ckpt_dir, state)
        logger.flush()
    logger.close()


if __name__ == "__main__":
    main(parser.parse_args())
