"""The trainer LEARNS — not just runs (VERDICT r4 #3).

The reference's training half exists to produce the abl04 table
(cva_mvsnet/train.py:122 -> abl04_fewer_depth_planes.txt, abs_rel 0.0102);
a trainer with a subtly wrong loss mask, LR schedule, or gradient wiring
would still pass smoke tests that only check a checkpoint appears. This
test overfits a small cascade FROM SCRATCH on the committed trajectory
fixture and gates on the measured learning curve (calibration run,
docs/PERF.md "Trainer learning proof": loss 2.298 -> 0.175, stage1 abs_rel
1.120 -> 0.070 by step 40 at seed 0; thresholds hold 2x margin), then
asserts the 8-device virtual-mesh data-parallel step reproduces the
single-device loss trajectory step-for-step.
"""

import jax
import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + 8 virtual devices)

import jax.numpy as jnp

from tandem_tpu import config as cfg
from tandem_tpu.data.replica import MVSDataset, collate
from tandem_tpu.train.trainer import (create_train_state, make_mesh,
                                      make_train_step, shard_batch)

import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "replica_traj")

BATCH_KEYS = ("image", "cam_to_world", "depth_min", "depth_max",
              "intrinsics", "depth", "mask")


def _small_config():
    config = cfg.default()
    for k, v in {"MODEL.DEPTH_NUM": (8, 8, 4), "TRAIN.BATCH_SIZE": 2,
                 "DATA.IMG_HEIGHT": 96, "DATA.IMG_WIDTH": 128}.items():
        config[k] = v
    return config


def _fixture_batch(config):
    ds = MVSDataset(FIXTURE, "val", height=config["DATA.IMG_HEIGHT"],
                    width=config["DATA.IMG_WIDTH"])
    batch = collate([ds[0], ds[7]])
    return {k: batch[k] for k in BATCH_KEYS}


@pytest.mark.slow
def test_trainer_overfits_fixture():
    config = _small_config()
    batch = jax.tree_util.tree_map(jnp.asarray, _fixture_batch(config))
    model, state = create_train_state(config, jax.random.PRNGKey(0), 200,
                                      example_shape=(1, 7, 96, 128))
    step_fn = make_train_step(model, config, mesh=None)
    losses, absrel = [], []
    for _ in range(41):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
        absrel.append(float(m["stage1/abs_rel"]))
    assert np.isfinite(losses).all()
    # Learning-curve gates (2x margin on the calibration run).
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    assert absrel[-1] < 0.15, absrel[-1]
    # Loss decreases robustly, not by a lucky final step.
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])


@pytest.mark.slow
def test_sam_step_two_pass_semantics():
    """TRAIN.SAM wires the two-step SAM (module.py:1568-1629): the update
    must equal applying the base optimizer to the gradient taken at
    params + rho*g/||g|| — checked against a hand-rolled two-pass step —
    and must differ from the plain step."""
    from tandem_tpu.train.trainer import _loss_fn
    from tandem_tpu.train.utils import sam_perturb

    import optax

    config = _small_config()
    config["TRAIN.SAM"] = True
    config["TRAIN.SAM_RHO"] = 0.05
    batch = jax.tree_util.tree_map(jnp.asarray, _fixture_batch(config))
    model, state0 = create_train_state(config, jax.random.PRNGKey(1), 50,
                                       example_shape=(1, 7, 96, 128))
    # Swap Adam for SGD(1.0): params_new = params - grad, so the parameter
    # comparison directly reflects the GRADIENT the step applied (Adam's
    # sign-normalized updates would turn last-bit grad noise into full
    # +-lr flips on near-zero entries).
    sgd = optax.sgd(1.0)
    base = state0.replace(tx=sgd, opt_state=sgd.init(state0.params))

    # Hand-rolled reference FIRST (the jitted step donates + deletes state):
    # two explicit forward-backward passes.
    loss_cfg = dict(weights=tuple(config["LOSS.STAGE_WEIGHTS"]),
                    loss_terms=tuple(config["LOSS.TERMS"]),
                    term_weights=tuple(config["LOSS.TERM_WEIGHTS"]))
    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
    (_, (_, _, _)), g1 = grad_fn(base.params, base.batch_stats, model,
                                 batch, loss_cfg)
    perturbed = sam_perturb(base.params, g1, rho=0.05)
    (_, (_, _, stats2)), g2 = grad_fn(perturbed, base.batch_stats, model,
                                      batch, loss_cfg)
    expect_params = jax.device_get(base.apply_gradients(g2, stats2).params)
    plain_params = jax.device_get(base.apply_gradients(g1, stats2).params)

    sam_state, _ = make_train_step(model, config, mesh=None,
                                   with_metrics=False)(base, batch)
    got = jax.device_get(sam_state.params)

    def dist(a, b):
        return float(np.sqrt(jax.tree_util.tree_reduce(
            lambda acc, x: acc + float((x ** 2).sum()),
            jax.tree_util.tree_map(lambda p, q: p - q, a, b), 0.0)))

    # The jitted step must land on the hand-rolled two-pass SAM point, far
    # closer to it than to the single-pass point. (Exact equality is
    # ill-conditioned: the second gradient is taken at a perturbed point,
    # so f32 reassociation noise in g1 is amplified by local curvature.)
    d_impl = dist(got, expect_params)
    d_wiring = dist(got, plain_params)
    assert d_wiring > 1e-4, "SAM step equals the plain step — not wired"
    assert d_impl < 0.05 * d_wiring, (
        f"jitted SAM step is {d_impl:.2e} from the hand-rolled two-pass "
        f"point but only {d_wiring:.2e} from the plain step")


@pytest.mark.slow
def test_mesh_train_step_matches_single_device():
    """The 8-device DP step is the SAME optimization: identical init +
    identical global batch must reproduce the single-device loss
    trajectory (psum-mean of per-shard grads == global-batch grads up to
    reduction order)."""
    config = _small_config()
    batch = _fixture_batch(config)
    # 8-entry global batch (leading axis shards over the 'data' mesh axis)
    rep = lambda v: ({k: rep(x) for k, x in v.items()} if isinstance(v, dict)
                     else np.repeat(np.asarray(v), 4, axis=0))
    batch8 = {k: rep(v) for k, v in batch.items()}

    losses = {}
    for mode in ("single", "mesh"):
        model, state = create_train_state(config, jax.random.PRNGKey(3), 50,
                                          example_shape=(1, 7, 96, 128))
        mesh = make_mesh(8) if mode == "mesh" else None
        step_fn = make_train_step(model, config, mesh=mesh)
        dev_batch = (shard_batch(batch8, mesh) if mesh is not None
                     else jax.tree_util.tree_map(jnp.asarray, batch8))
        ls = []
        for _ in range(3):
            state, m = step_fn(state, dev_batch)
            ls.append(float(m["loss"]))
        losses[mode] = ls
    np.testing.assert_allclose(losses["mesh"], losses["single"],
                               rtol=5e-3, atol=1e-5)
