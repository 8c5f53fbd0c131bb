"""Time the cascade's per-stage glue: softmax/E[d]/confidence + range prep.

CostRegNet is ~9 ms total and the warp+agg compositions are ~120 ms, yet
the model measures ~198 — each stage seems to carry ~15 ms of glue. This
times the post-costreg block (softmax over D, expected depth, 4-plane
confidence) and the pre-warp block (prev-depth upsample + adaptive range)
at deployment shapes.

Run: timeout 2400 python experiments/bench_stage_glue.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tandem_tpu.models.ranges import adaptive_depth_range
from tandem_tpu.models.layers import interpolate_bilinear
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

SHAPES = {
    "stage1": (48, 120, 160),
    "stage2": (32, 240, 320),
    "stage3": (8, 480, 640),
}


def post_block(logits, depth_in):
    D = logits.shape[1]
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    depth = jnp.sum(prob * depth_in.astype(jnp.float32), axis=1)
    prob_pad = jnp.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
    prob4 = (prob_pad[:, 0:D] + prob_pad[:, 1:D + 1]
             + prob_pad[:, 2:D + 2] + prob_pad[:, 3:D + 3])
    idx_f = jnp.sum(prob * jnp.arange(D, dtype=jnp.float32)[None, :, None,
                                                            None], axis=1)
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)
    onehot = (jnp.arange(D, dtype=jnp.int32)[None, :, None, None]
              == idx[:, None])
    conf = jnp.sum(jnp.where(onehot, prob4, 0.0), axis=1)
    return depth, conf


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    for name, (D, H, W) in SHAPES.items():
        logits = jax.random.normal(key, (1, D, H, W), jnp.float32).astype(
            jnp.bfloat16)
        depth_in = 1.0 + jax.random.uniform(key, (1, D, H, W), jnp.float32)
        f = jax.jit(post_block)
        jax.block_until_ready(f(logits, depth_in))
        t = device_time(lambda: f(logits, depth_in), iters=10) * 1e3
        print(f"{name} post (softmax+E[d]+conf) D={D}: {t:7.2f} ms",
              flush=True)

        if name != "stage1":
            Hp, Wp = H // 2, W // 2
            prev = 1.0 + jax.random.uniform(key, (1, Hp, Wp), jnp.float32)
            interval = jnp.full((1,), 0.05)

            def pre(prev, interval):
                up = interpolate_bilinear(prev[..., None], H, W,
                                          align_corners=False)[..., 0]
                return adaptive_depth_range(depth=up, interval=interval,
                                            depth_num=D)
            g = jax.jit(pre)
            jax.block_until_ready(g(prev, interval))
            t = device_time(lambda: g(prev, interval), iters=10) * 1e3
            print(f"{name} pre (upsample+range) D={D}: {t:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
