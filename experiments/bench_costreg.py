"""Per-stage CostRegNet (3D U-Net) device times at deployment shapes.

Itemizes the non-warp model cost: stage1 (48,120,160,C32), stage2
(32,240,320,C16), stage3 (8,480,640,C8), eval path (folded BN).

Run: timeout 2400 python experiments/bench_costreg.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tandem_tpu.models.cost_reg import CostRegNet
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

SHAPES = {
    "stage1": (48, 120, 160, 32),
    "stage2": (32, 240, 320, 16),
    "stage3": (8, 480, 640, 8),
}


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    for name, (D, H, W, C) in SHAPES.items():
        x = jax.random.normal(key, (1, D, H, W, C), jnp.float32).astype(
            jnp.bfloat16)
        net = CostRegNet(base_channels=8, dtype=jnp.bfloat16,
                         has_four_depths=False)
        variables = net.init(key, x, train=False)
        fn = jax.jit(lambda v, x: net.apply(v, x, train=False))
        out = jax.block_until_ready(fn(variables, x))
        t = device_time(lambda: fn(variables, x), iters=10) * 1e3
        print(f"{name} cost_reg {x.shape}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
