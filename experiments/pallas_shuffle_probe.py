"""Probe 2: Mosaic dynamic_gather as a same-shape sublane shuffle.

Mosaic's lax.gather lowering (jax/_src/pallas/mosaic/lowering.py:2464) only
supports out.shape == indices.shape == table.shape, 2D, gathering along dim 0
(sublanes) or dim 1 (lanes). So: keep the whole source table in VMEM and
produce table-shaped chunks of gathered rows per grid step. This measures
whether the underlying tpu.dynamic_gather is vectorized (fast) or a
select-loop (useless) at plane-sweep table sizes.

Run: timeout 1800 python experiments/pallas_shuffle_probe.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing


def make_shuffle(m, lanes, g):
    """out[i] = tbl[idx[i]] in table-shaped chunks; grid over g chunks."""
    def kernel(tbl_ref, idx_ref, out_ref):
        idxb = jnp.broadcast_to(idx_ref[:], (m, lanes))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idxb, axis=0)

    def fn(tbl, idx):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((m, lanes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g * m, lanes), tbl.dtype),
        )(tbl, idx)
    return fn


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)

    # --- correctness, small ---
    m, lanes = 1024, 16
    tbl = jax.random.normal(key, (m, lanes), jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (2 * m, 1), 0, m, jnp.int32)
    try:
        out = jax.jit(make_shuffle(m, lanes, 2))(tbl, idx)
        ref = np.asarray(tbl)[np.asarray(idx)[:, 0]]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"correctness m={m} lanes={lanes}: {'OK' if ok else 'WRONG'}")
        if not ok:
            bad = np.nonzero(~(np.asarray(out) == ref).all(-1))[0]
            print("first bad rows:", bad[:8])
    except Exception as e:  # noqa: BLE001
        print("small shuffle FAILED:", str(e)[:500])
        return

    # --- throughput at plane-sweep table size ---
    m = 241 * 321  # 77361 padded stage2 source rows
    for lanes in (16, 64, 128):
        g = 8
        tbl = jax.random.normal(
            key, (m, lanes), jnp.float32).astype(jnp.bfloat16)
        idx = jax.random.randint(key, (g * m, 1), 0, m, jnp.int32)
        try:
            fn = jax.jit(make_shuffle(m, lanes, g))
            out = fn(tbl, idx)
            out.block_until_ready()
            t = device_time(lambda: fn(tbl, idx), iters=10)
            rows = g * m
            print(f"shuffle m={m} lanes={lanes:3d}: {t*1e3:8.3f} ms "
                  f"({rows / t / 1e6:8.1f} M rows/s)")
        except Exception as e:  # noqa: BLE001
            print(f"shuffle m={m} lanes={lanes}: FAILED {str(e)[:300]}")


if __name__ == "__main__":
    main()


# MEASURED RESULTS (v5e, 2026-08-17, round 2 continuation):
# - Mosaic's lax.gather lowering only accepts out.shape == idx.shape ==
#   table.shape (2D); beyond that the asserts/backend reject it.
# - tpu.dynamic_gather itself compiles ONLY within a single hardware tile:
#   dim0 (sublanes): m == 8 exactly, f32/i32 only (bf16 fails, m=64 fails).
#   dim1 (lanes): lanes == 128 exactly, any sublane count m, f32 only.
# - dim1 throughput: ~0.44us per (64,128) gather, ~3.9us per (1024,128):
#   20-34 G elems/s — the SAME rate as XLA's HBM gather at plane-sweep
#   shapes (2.46M x 64-elem rows in 6.5 ms = 24 G elems/s). There is no
#   faster per-lane shuffle path to exploit; the warp's XLA gather is at
#   the hardware's sustained gather rate already (~420 M rows/s measured
#   on the real stage2/3 tables). Conclusion: a Pallas gather kernel can
#   NOT beat the XLA plane-sweep warp; improvements must reduce gathered
#   elements or come from elsewhere.
