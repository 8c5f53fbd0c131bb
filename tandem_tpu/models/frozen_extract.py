"""Recover trained CVA-MVSNet weights from the reference's frozen exports.

The reference ships its trained flagship model only as frozen TorchScript
files (tandem/exported/tandem{,_512x320}/model.pt, produced by
cva_mvsnet/export_model.py:193-209 with freeze + optimizations).  Freezing
inlines every parameter as an anonymous graph constant, so ``state_dict()``
is empty and attribute names are gone.  Two layouts exist in the wild:

- ``exported/tandem`` (640x480): CUDA-optimized — conv+BN+ReLU fused into
  ``aten::cudnn_convolution_relu`` with the BatchNorm folded into the conv
  weights; only the transposed convs kept separate ``aten::batch_norm``.
- ``exported/tandem_512x320``: plain frozen — every conv is
  ``aten::_convolution`` followed by its own ``aten::batch_norm``.

This module reconstructs an eager-layout state_dict by walking the inlined
graph's *dataflow*: conv-like nodes are matched to reference module names via
weight shapes plus nearest conv ancestors (e.g. ``conv1.1`` is the conv whose
input chain reaches ``conv1.0``), which disambiguates same-shaped layers.
Convs whose BN was folded are emitted with an identity BN carrying the folded
bias as beta and running_var = 1 - eps, so the eval-mode BN is exactly
identity + bias; unfused convs get their real BN parameters.

The result feeds torch_convert.convert_state_dict → flax variables, i.e. the
shipped trained network becomes loadable by the TPU runtime.  Functional
equivalence to the deployed artifact is exact by construction.

No torch code is copied from the reference; torch.jit is only used to read
the artifact.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

_BN_EPS = 1e-5  # torch BatchNorm default, matches models/layers.py BN eps

_CONV_KINDS = {
    "aten::conv2d", "aten::conv3d", "aten::_convolution",
    "aten::cudnn_convolution_relu", "aten::cudnn_convolution_add_relu",
    "aten::batch_norm",
}


def _const_tensor(value):
    node = value.node()
    if node.kind() == "prim::Constant" and "Tensor" in str(value.type()):
        try:
            return node.t("value").detach().cpu().numpy()
        except RuntimeError:
            return None
    return None


class _Op:
    def __init__(self, node):
        self.node = node
        self.kind = node.kind()
        ins = list(node.inputs())
        self.weight = _const_tensor(ins[1]) if len(ins) > 1 else None
        self.bias = _const_tensor(ins[2]) if len(ins) > 2 else None
        self.inputs = ins
        self.transposed = False
        if self.kind == "aten::_convolution":
            self.transposed = bool(ins[6].node().output().toIValue())
        if self.kind == "aten::batch_norm":
            # (input, gamma, beta, mean, var, training, momentum, eps, ...)
            self.gamma = _const_tensor(ins[1])
            self.beta = _const_tensor(ins[2])
            self.mean = _const_tensor(ins[3])
            self.var = _const_tensor(ins[4])

    @property
    def is_bn(self):
        return self.kind == "aten::batch_norm"

    @property
    def wshape(self):
        return tuple(self.weight.shape) if self.weight is not None else None


def _collect_ops(graph) -> List[_Op]:
    ops = []

    def walk(block):
        for n in block.nodes():
            for b in n.blocks():
                walk(b)
            if n.kind() in _CONV_KINDS:
                ops.append(_Op(n))
    walk(graph)
    return ops


class _Graph:
    """Dataflow index over the conv/bn ops of an inlined frozen graph."""

    def __init__(self, ops: List[_Op]):
        self.ops = ops
        self.by_id = {id(o): o for o in ops}
        producer = {}
        for op in ops:
            for out in op.node.outputs():
                producer[out] = op
        memo: Dict = {}

        def anc_value(v):
            if v in memo:
                return memo[v]
            memo[v] = frozenset()  # cycle guard
            if v in producer:
                memo[v] = frozenset([id(producer[v])])
                return memo[v]
            acc = set()
            for inp in v.node().inputs():
                acc |= anc_value(inp)
            memo[v] = frozenset(acc)
            return memo[v]

        # direct: nearest conv/bn ancestors (stopping at any conv-like op)
        self.direct = {id(o): anc_value(o.inputs[0]) for o in ops}
        # thru_bn: same, but bn ancestors are replaced by their own conv
        # ancestors (so a conv chain "sees through" interleaved BNs)
        self.thru = {}
        for o in ops:
            acc = set()
            for a in self.direct[id(o)]:
                ao = self.by_id[a]
                if ao.is_bn:
                    acc |= self.direct[a]
                else:
                    acc.add(a)
            self.thru[id(o)] = frozenset(acc)

        self.bns = [o for o in ops if o.is_bn]

    def bn_for(self, conv: _Op) -> Optional[_Op]:
        hits = [b for b in self.bns if self.direct[id(b)] == {id(conv)}]
        assert len(hits) <= 1, f"conv has {len(hits)} BNs"
        return hits[0] if hits else None

    def feeds(self, a: _Op, b: _Op) -> bool:
        return id(a) in self.thru[id(b)]

    def chain_next(self, cands, prev: _Op, shape) -> _Op:
        hits = [o for o in cands
                if o.wshape == shape and self.feeds(prev, o)]
        if len(hits) != 1:
            raise ValueError(f"dataflow match failed: shape {shape} after "
                             f"{prev.wshape}: {len(hits)} hits")
        return hits[0]


def _identity_bn(sd, prefix: str, c: int, bias):
    sd[f"{prefix}.weight"] = np.ones(c, np.float32)
    sd[f"{prefix}.bias"] = (bias if bias is not None
                            else np.zeros(c, np.float32))
    sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
    sd[f"{prefix}.running_var"] = np.full(c, 1.0 - _BN_EPS, np.float32)


def _real_bn(sd, prefix: str, bn: _Op):
    sd[f"{prefix}.weight"] = bn.gamma
    sd[f"{prefix}.bias"] = bn.beta
    sd[f"{prefix}.running_mean"] = bn.mean
    sd[f"{prefix}.running_var"] = bn.var


def extract_frozen_state_dict(model_pt_path: str) -> Dict[str, np.ndarray]:
    """Load a frozen reference export and reconstruct the trained weights as
    an eager-layout numpy state_dict (reference naming)."""
    import torch

    mod = torch.jit.load(model_pt_path, map_location="cpu")
    graph = mod.graph
    torch._C._jit_pass_inline(graph)

    G = _Graph(_collect_ops(graph))
    convs = [o for o in G.ops if not o.is_bn and not o.transposed
             and o.weight is not None]
    conv2d = [o for o in convs if o.weight.ndim == 4]
    conv3d = [o for o in convs if o.weight.ndim == 5]
    deconv3d = [o for o in G.ops if o.transposed]

    sd: Dict[str, np.ndarray] = {}

    def put_wrapped(prefix: str, op: _Op):
        """Conv2d/Conv3d wrapper (conv + BN + ReLU, module.py:64,167)."""
        sd[f"{prefix}.conv.weight"] = op.weight
        bn = G.bn_for(op)
        if bn is not None:
            _real_bn(sd, f"{prefix}.bn", bn)
        else:
            _identity_bn(sd, f"{prefix}.bn", op.weight.shape[0], op.bias)

    def put_gate(base: str, idx: int, op: _Op):
        """Gate Sequential entries idx (Conv3d w/ bias) and idx+1 (BN)."""
        sd[f"{base}.{idx}.weight"] = op.weight
        sd[f"{base}.{idx}.bias"] = (op.bias if op.bias is not None
                                    else np.zeros(1, np.float32))
        bn = G.bn_for(op)
        if bn is not None:
            _real_bn(sd, f"{base}.{idx + 1}", bn)
        else:
            _identity_bn(sd, f"{base}.{idx + 1}", 1, None)

    # ---- FeatureNet tower (module.py FeatureNet): linear chain ----
    first = [o for o in conv2d if o.weight.shape[1] == 3]
    assert len(first) >= 1, "no FeatureNet conv0.0 found"
    w0 = first[0].weight
    for o in first[1:]:
        np.testing.assert_array_equal(w0, o.weight)
    tower_shapes = [("conv0.1", (8, 8, 3, 3)), ("conv1.0", (16, 8, 5, 5)),
                    ("conv1.1", (16, 16, 3, 3)), ("conv1.2", (16, 16, 3, 3)),
                    ("conv2.0", (32, 16, 5, 5)), ("conv2.1", (32, 32, 3, 3)),
                    ("conv2.2", (32, 32, 3, 3))]
    cur = first[0]
    put_wrapped("feature_net.conv0.0", cur)
    pool = [o for o in conv2d if o not in first
            and (o.kind.startswith("aten::cudnn_convolution")
                 or G.bn_for(o) is not None)]
    for name, shape in tower_shapes:
        nxt = G.chain_next(pool, cur, shape)
        pool.remove(nxt)
        put_wrapped(f"feature_net.{name}", nxt)
        cur = nxt
    assert not pool, f"{len(pool)} unmatched FeatureNet tower convs"

    # ---- FPN out/skip convs: bare convs (no BN), shapes all distinct ----
    plain_map = {(32, 32, 1, 1): "out.stage1", (16, 32, 3, 3): "out.stage2",
                 (8, 32, 3, 3): "out.stage3", (32, 16, 1, 1): "skip.stage2",
                 (32, 8, 1, 1): "skip.stage3"}
    bare2d = [o for o in conv2d if o not in first
              and not o.kind.startswith("aten::cudnn_convolution")
              and G.bn_for(o) is None]
    assert len(bare2d) == len(plain_map), (len(bare2d), "bare conv2d")
    for op in bare2d:
        name = plain_map[op.wshape]
        sd[f"feature_net.{name}.weight"] = op.weight
        if op.bias is not None:
            sd[f"feature_net.{name}.bias"] = op.bias

    # ---- Volume gates: 1x1x1 conv3d pairs, repeated per src view ----
    stage_of_c = {32: "stage1", 16: "stage2", 8: "stage3"}
    gate0 = {}
    for c_in, stage in stage_of_c.items():
        insts = [o for o in conv3d if o.wshape == (1, c_in, 1, 1, 1)]
        assert len(insts) >= 1, f"no gate0 for {stage}"
        for o in insts[1:]:
            np.testing.assert_array_equal(insts[0].weight, o.weight)
        put_gate(f"volume_gates.{stage}", 0, insts[0])
        gate0[stage] = insts
    for stage, insts in gate0.items():
        keys = {id(i) for i in insts}
        g1 = [o for o in conv3d if o.wshape == (1, 1, 1, 1, 1)
              and G.thru[id(o)] & keys]
        assert len(g1) == len(insts), (stage, len(g1))
        for o in g1[1:]:
            np.testing.assert_array_equal(g1[0].weight, o.weight)
        put_gate(f"volume_gates.{stage}", 3, g1[0])

    # ---- CostRegNet per stage: chain from the stage-unique conv0 ----
    reg_shapes = [("conv1", (16, 8, 3, 3, 3)), ("conv2", (16, 16, 3, 3, 3)),
                  ("conv3", (32, 16, 3, 3, 3)), ("conv4", (32, 32, 3, 3, 3)),
                  ("conv5", (64, 32, 3, 3, 3)), ("conv6", (64, 64, 3, 3, 3))]
    deconv_shapes = [("conv7", (64, 32, 3, 3, 3)),
                     ("conv9", (32, 16, 3, 3, 3)),
                     ("conv11", (16, 8, 3, 3, 3))]
    for c_in, stage in stage_of_c.items():
        base = f"cost_regularization_net.{stage}"
        conv0s = [o for o in conv3d if o.wshape == (8, c_in, 3, 3, 3)]
        assert len(conv0s) == 1, (stage, "conv0", len(conv0s))
        cur = conv0s[0]
        put_wrapped(f"{base}.conv0", cur)
        reg_shape_set = {s for _, s in reg_shapes}
        pool3 = [o for o in conv3d if o.wshape in reg_shape_set]
        for name, shape in reg_shapes:
            nxt = G.chain_next(pool3, cur, shape)
            pool3.remove(nxt)
            put_wrapped(f"{base}.{name}", nxt)
            cur = nxt
        for name, shape in deconv_shapes:
            nxt = G.chain_next(deconv3d, cur, shape)
            sd[f"{base}.{name}.conv.weight"] = nxt.weight
            bn = G.bn_for(nxt)
            assert bn is not None, (stage, name, "deconv BN missing")
            _real_bn(sd, f"{base}.{name}.bn", bn)
            cur = nxt
        probs = [o for o in conv3d if o.wshape == (1, 8, 3, 3, 3)
                 and G.feeds(cur, o)]
        assert len(probs) == 1, (stage, "prob", len(probs))
        sd[f"{base}.prob.weight"] = probs[0].weight

    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def extract_reference_weights(model_pt_path: str) -> Dict[str, np.ndarray]:
    """Trained weights from a reference TorchScript export, preferring the
    plain ``state_dict()`` when the archive kept named parameters (the
    512x320 export) and falling back to graph extraction for fully frozen
    archives (the 640x480 export).  Both exports ship the same checkpoint —
    verified by refolding: every folded conv weight in the 640 export equals
    W * gamma / sqrt(var + eps) of the 512 export's unfused parameters."""
    import torch

    mod = torch.jit.load(model_pt_path, map_location="cpu")
    sd = {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    if sd:
        return sd
    return extract_frozen_state_dict(model_pt_path)


def load_frozen_reference(model_pt_path: str):
    """Frozen reference export → tandem_tpu flax variables."""
    from .torch_convert import convert_state_dict
    sd = extract_reference_weights(model_pt_path)
    return convert_state_dict(sd, view_aggregation=True)
