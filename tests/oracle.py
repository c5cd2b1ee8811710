"""Load reference (PyTorch) modules from /root/reference as parity oracles.

The reference implementation is NEVER shipped or copied; these helpers import
it read-only at test time to verify that our from-scratch TPU implementation
computes the same functions.  All parity tests skip if the reference tree or
its torch deps are unavailable.
"""

import importlib.util
import sys
import types

import pytest

REFERENCE = "/root/reference"


def _stub_modules():
    """Stub the heavyweight deps the reference imports but parity tests
    don't exercise (timm weight zoo, addict)."""
    def _mk(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        return mod

    if "timm" not in sys.modules:
        import torch

        timm = _mk("timm")
        models = _mk("timm.models")
        layers = _mk("timm.models.layers")
        registry = _mk("timm.models.registry")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        def drop_path(x, drop_prob=0.0, training=False):
            if drop_prob == 0.0 or not training:
                return x
            keep = 1 - drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            mask.floor_()
            return x.div(keep) * mask

        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.drop_path = drop_path
        registry.register_model = lambda fn: fn
        models.layers = layers
        models.registry = registry
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
        sys.modules["timm.models.registry"] = registry

    if "ftfy" not in sys.modules:
        # identity fix_text: parity tests feed well-formed text, so the
        # mojibake repair is a no-op on both sides
        ftfy = _mk("ftfy")
        ftfy.fix_text = lambda t: t
        sys.modules["ftfy"] = ftfy

    if "addict" not in sys.modules:
        addict = _mk("addict")

        class Dict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        addict.Dict = Dict
        sys.modules["addict"] = addict


def load_reference_module(relpath: str, name: str):
    """Import a reference file as a standalone module (skips if missing)."""
    import os

    path = os.path.join(REFERENCE, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file not available: {path}")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    _stub_modules()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # some reference eval files are python2; patch the handful of py2-isms
    # so they run as oracles (source is never shipped, only executed here)
    src = open(path).read()
    for old, new in (
        ("iteritems()", "items()"),
        ("itervalues()", "values()"),
        ("iterkeys()", "keys()"),
        # transformers moved these out of modeling_utils
        ("""from transformers.modeling_utils import (
    PreTrainedModel,
    apply_chunking_to_forward,
    find_pruneable_heads_and_indices,
    prune_linear_layer,
)""",
         "from transformers.modeling_utils import PreTrainedModel\n"
         "from transformers.pytorch_utils import ("
         "apply_chunking_to_forward, find_pruneable_heads_and_indices, "
         "prune_linear_layer)"),
    ):
        src = src.replace(old, new)
    mod.xrange = range
    sys.modules[name] = mod
    code = compile(src, path, "exec")
    exec(code, mod.__dict__)
    return mod
