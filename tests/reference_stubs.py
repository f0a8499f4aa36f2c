"""Minimal stubs letting the reference package import as a test oracle
(torchvision / pytorch_lightning / clip aren't installed in the TPU image;
the oracle code paths we exercise never actually use them)."""

import importlib.machinery
import sys
import types


def _module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    # a real-looking __spec__ so importlib.util.find_spec() on the stub
    # doesn't raise (transformers probes torchvision availability this way)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_reference_stubs():
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv.models = _module("torchvision.models")
        tv.transforms = _module("torchvision.transforms")
        tv.transforms.Normalize = lambda *a, **k: None
        tv.transforms.Compose = lambda *a, **k: None
        tv.transforms.ToTensor = lambda *a, **k: None
        tv.transforms.Resize = lambda *a, **k: None
        tv.transforms.CenterCrop = lambda *a, **k: None
        tv.transforms.RandomResizedCrop = lambda *a, **k: None
        tv.transforms.RandomApply = lambda *a, **k: None
        tv.transforms.RandomHorizontalFlip = lambda *a, **k: None
        tv.transforms.InterpolationMode = types.SimpleNamespace(
            BICUBIC="bicubic")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms

    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")

        class _Stub:
            def __init__(self, *a, **k):
                pass

        pl.LightningDataModule = _Stub
        pl.LightningModule = _Stub
        sys.modules["pytorch_lightning"] = pl

    if "clip" not in sys.modules:
        clip = _module("clip")
        clip.tokenize = lambda *a, **k: None
        clip.load = lambda *a, **k: (None, None)
        sys.modules["clip"] = clip
