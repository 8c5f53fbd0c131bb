"""Helper to import the untrusted reference (torch) model for parity tests.

We only *execute* the reference to produce golden outputs; nothing from it is
copied into tandem_tpu. Missing optional deps (torchvision, kornia) are stubbed
out because the model code imports them at module level without using them in
the forward path.
"""

import importlib
import sys
import types

REF_MODELS = "/root/reference/cva_mvsnet/models"


def import_reference_models():
    for stub in ("torchvision", "kornia", "kornia.augmentation"):
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_MODELS]
        sys.modules["refmodels"] = pkg
    module = importlib.import_module("refmodels.module")
    cva = importlib.import_module("refmodels.cva_mvsnet")
    return module, cva


def state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
