"""Which corner-selection mechanism makes the grouped plane-gather win?

The grouped warp replaces D per-sample row gathers with D/G patch-row
gathers (the gather is issue-rate bound at ~420 M rows/s) — but the 4
bilinear corners must then be SELECTED from each patch row per sample, and
the first implementation (one-hot einsum over P^2 lanes) materialized
(samples, P^2) mask tensors and measured 3.6x SLOWER than plain at stage 3.

This measures, per stage shape, 6 'views' composed in one jit:
  plain       : (D*HW) row gather of packed 4C corners + weighted sum
  take        : (D/G*HW) patch gather + take_along_axis (per-lane shuffle)
  chain       : patch gather + k-term fused where-multiply accumulation
  einsum      : patch gather + one-hot einsum (the losing baseline)

Run: TANDEM_PLATFORM=axon timeout 3000 python experiments/bench_group_select.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

V = 6
# name, HW, D, C
STAGES = {
    "stage2": (240 * 320, 32, 16),
    "stage3": (480 * 640, 8, 8),
}


def coherent(n, hi, rng):
    base = np.linspace(0, hi - 2, n)
    return np.clip(base + rng.uniform(-2, 2, n), 0, hi - 1).astype(np.int32)


def build(stage, G, P, rng):
    HW, D, C = STAGES[stage]
    R = (D // G) * HW                       # patch rows
    S = D * HW                              # samples
    k = P * P
    tbl_plain = jnp.asarray(rng.standard_normal((HW + 257, 4 * C)),
                            jnp.bfloat16)
    tbl_patch = jnp.asarray(rng.standard_normal((HW // 4 + 257, k * C)),
                            jnp.bfloat16)
    idx_plain = jnp.asarray(coherent(S, HW + 256, rng))
    idx_patch = jnp.asarray(coherent(R, HW // 4 + 256, rng))
    i00 = jnp.asarray(rng.integers(0, max(k - P - 2, 1), S).astype(np.int32)
                      .reshape(R, G))
    ws = tuple(jnp.asarray(rng.standard_normal(S).astype(np.float32)
                           .reshape(R, G), jnp.bfloat16) for _ in range(4))
    return dict(HW=HW, D=D, C=C, R=R, G=G, P=P, k=k, tbl_plain=tbl_plain,
                tbl_patch=tbl_patch, idx_plain=idx_plain,
                idx_patch=idx_patch, i00=i00, ws=ws)


def f_plain(d):
    C = d["C"]

    def one(i):
        g = d["tbl_plain"][(d["idx_plain"] + i) % d["tbl_plain"].shape[0]]
        w00, w10, w01, w11 = d["ws"]
        S = g.shape[0]
        wr = lambda w: w.reshape(S, 1)
        return (g[:, 0 * C:1 * C] * wr(w00) + g[:, 1 * C:2 * C] * wr(w10)
                + g[:, 2 * C:3 * C] * wr(w01) + g[:, 3 * C:4 * C] * wr(w11))
    return lambda: sum(jnp.sum(one(i)) for i in range(V))


def gathered(d, i):
    g = d["tbl_patch"][(d["idx_patch"] + i) % d["tbl_patch"].shape[0]]
    return g.reshape(d["R"], d["k"], d["C"])


def f_take(d):
    P = d["P"]

    def one(i):
        gr = gathered(d, i)                             # (R, k, C)
        grb = jnp.broadcast_to(gr[:, None], (d["R"], d["G"], d["k"], d["C"]))
        i4 = jnp.stack([d["i00"], d["i00"] + 1, d["i00"] + P,
                        d["i00"] + P + 1], -1)          # (R, G, 4)
        c = jnp.take_along_axis(grb, i4[..., None], axis=2)  # (R, G, 4, C)
        w = jnp.stack(d["ws"], -1)                      # (R, G, 4)
        return jnp.sum(c * w[..., None], axis=2)
    return lambda: sum(jnp.sum(one(i)) for i in range(V))


def f_chain(d):
    P, k = d["P"], d["k"]

    def one(i):
        gr = gathered(d, i)                             # (R, k, C)
        w00, w10, w01, w11 = d["ws"]
        i00 = d["i00"]
        out = jnp.zeros((d["R"], d["G"], d["C"]), jnp.bfloat16)
        zero = jnp.zeros((), jnp.bfloat16)
        for j in range(k):
            mj = (jnp.where(i00 == j, w00, zero)
                  + jnp.where(i00 == j - 1, w10, zero)
                  + jnp.where(i00 == j - P, w01, zero)
                  + jnp.where(i00 == j - P - 1, w11, zero))
            out = out + mj[..., None] * gr[:, None, j, :]
        return out
    return lambda: sum(jnp.sum(one(i)) for i in range(V))


def f_einsum(d):
    P, k = d["P"], d["k"]

    def one(i):
        gr = gathered(d, i)
        w00, w10, w01, w11 = d["ws"]
        kk = jnp.arange(k, dtype=jnp.int32)
        dd = kk - d["i00"][..., None]                   # (R, G, k)
        zero = jnp.zeros((), jnp.bfloat16)
        m = (jnp.where(dd == 0, w00[..., None], zero)
             + jnp.where(dd == 1, w10[..., None], zero)
             + jnp.where(dd == P, w01[..., None], zero)
             + jnp.where(dd == P + 1, w11[..., None], zero))
        return jnp.einsum("rgk,rkc->rgc", m, gr)
    return lambda: sum(jnp.sum(one(i)) for i in range(V))


def main():
    force_real_timing()
    rng = np.random.default_rng(0)
    for stage in sys.argv[1:] or ["stage3", "stage2"]:
        HW, D, C = STAGES[stage]
        print(f"--- {stage}: HW={HW} D={D} C={C}, {V} views composed ---",
              flush=True)
        d0 = build(stage, 1, 2, rng)
        t = device_time(jax.jit(f_plain(d0)), iters=10)
        rows = V * D * HW
        print(f"  plain          : {t * 1e3:7.2f} ms "
              f"({rows / t / 1e6:6.0f} M rows/s)", flush=True)
        for G, P in ((4, 4), (4, 6), (8, 8), (8, 16)):
            if D % G:
                continue
            d = build(stage, G, P, rng)
            for name, fb in (("take", f_take), ("chain", f_chain),
                             ("einsum", f_einsum)):
                try:
                    t = device_time(jax.jit(fb(d)), iters=10)
                    print(f"  G={G} P={P} {name:6s}: {t * 1e3:7.2f} ms",
                          flush=True)
                except Exception as e:
                    print(f"  G={G} P={P} {name:6s}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
