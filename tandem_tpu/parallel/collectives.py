"""ICI collective-volume accounting for sharded programs.

The scale-out story (docs/PERF.md "few ms over ICI") needs a NUMBER
attached to the actual program, not design arithmetic: this module parses
a jitted function's lowered StableHLO and sums the payload of every
``stablehlo.all_reduce`` (the only collective the view-sharded cascade and
the DP trainer emit — psum). From the per-psum payload S on an n-device
ring, the standard all-reduce cost model gives 2*S*(n-1)/n bytes through
each chip's ICI links (reduce-scatter + all-gather halves; see the
jax-ml scaling-book collective model).

Parsed from the LOWERED module (semantic dtypes) rather than the compiled
HLO on purpose: the CPU backend used for virtual-mesh validation promotes
bf16 all-reduces to f32 (wrapped_convert), which would double-count the
bytes the TPU program actually moves.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "i64": 8, "ui64": 8, "i32": 4, "ui32": 4, "i16": 2, "ui16": 2,
    "i8": 1, "ui8": 1, "i1": 1,
}

# An all_reduce op ends its reduction region with `}) : (tensor<TYPE>) ->`;
# non-greedy is safe because regions hold only the scalar reducer.
_AR_RE = re.compile(
    r'"stablehlo\.all_reduce"(?:.(?!stablehlo\.all_reduce))*?'
    r'\}\)\s*:\s*\(tensor<([^>]+)>\)', re.DOTALL)


def _tensor_bytes(type_str: str) -> int:
    parts = type_str.split("x")
    dtype = parts[-1]
    dims = [int(p) for p in parts[:-1]] or [1]
    size = _DTYPE_BYTES.get(dtype)
    assert size is not None, f"unknown element type in tensor<{type_str}>"
    n = 1
    for d in dims:
        n *= d
    return n * size


def all_reduce_payloads(lowered_text: str) -> List[Tuple[str, int]]:
    """All psum payloads in a lowered module: [(tensor_type, bytes)]."""
    return [(m.group(1), _tensor_bytes(m.group(1)))
            for m in _AR_RE.finditer(lowered_text)]


def ici_bytes_per_chip(lowered_text: str, n_devices: int) -> Dict[str, float]:
    """Aggregate ICI traffic of one program execution.

    :return: dict with ``payload_bytes`` (sum of psum tensor payloads,
        per-shard size S as lowered), ``ici_bytes`` (ring all-reduce wire
        bytes per chip: sum 2*S*(n-1)/n), and ``n_collectives``.
    """
    payloads = all_reduce_payloads(lowered_text)
    total = float(sum(b for _, b in payloads))
    return {
        "payload_bytes": total,
        "ici_bytes": 2.0 * total * (n_devices - 1) / max(n_devices, 1),
        "n_collectives": len(payloads),
    }
