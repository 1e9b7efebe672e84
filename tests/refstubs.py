"""Import the UNMODIFIED reference implementation as a numerics oracle.

The reference package (`/root/reference/AffectGPT/my_affectgpt`) imports a
long tail of media/runtime deps that are absent from this image (decord,
torchvision, timm, omegaconf, ...). None of them participate in the model
math — they back the reference's data loaders and realtime encoders — so
this module installs inert auto-attribute stubs for exactly the missing
ones (real modules are always preferred) and re-exports two helpers that
moved inside transformers. The result: `my_affectgpt.models.affectgpt`
imports cleanly and its AffectGPT forward/generate run bit-for-bit the
reference's math on CPU, which the oracle parity tests compare against
affectgpt_tpu.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference/AffectGPT"

_MISSING = [
    "decord", "torchvision", "torchvision.transforms",
    "torchvision.transforms.functional", "torchvision.transforms._transforms_video",
    "webdataset",
    "timm", "timm.models", "timm.models.hub", "timm.models.layers",
    "timm.models.registry",
    "ftfy", "regex", "einx", "braceexpand",
    "pytorchvideo", "pytorchvideo.transforms",
    "pytorchvideo.data", "pytorchvideo.data.clip_sampling",
    "pytorchvideo.data.encoded_video",
    "openai", "sklearn", "sklearn.metrics", "scipy", "scipy.stats",
    "nltk", "jieba",
    "torchaudio", "torchaudio.compliance", "torchaudio.compliance.kaldi",
    "moviepy", "moviepy.editor", "soundfile", "whisper", "pandas",
    "iopath", "iopath.common", "iopath.common.download", "iopath.common.file_io",
]


class _Anything:
    """Inert placeholder: any attribute access / call returns itself."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return self

    def __call__(self, *a, **k):
        return self

    def __iter__(self):
        return iter(())


_anything = _Anything()


class _AnyMeta(type):
    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _anything


class _AnyModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        obj = _AnyMeta(name, (), {"__init__": lambda self, *a, **k: None})
        setattr(self, name, obj)
        return obj


_INSTALLED: list = []


def _stub(name, **attrs):
    _INSTALLED.append(name)
    mod = _AnyModule(name)
    mod.__path__ = []
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, _, child = name.rpartition(".")
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


class _OmegaConf:
    @staticmethod
    def load(p):
        raise RuntimeError("omegaconf stub: config loading not supported")

    @staticmethod
    def create(*a, **k):
        return {}

    @staticmethod
    def merge(*a, **k):
        return {}


def install() -> None:
    """Install stubs for missing deps and put the reference on sys.path."""
    if "omegaconf" not in sys.modules:
        try:
            importlib.import_module("omegaconf")
        except Exception:
            _stub("omegaconf", OmegaConf=_OmegaConf, DictConfig=dict, ListConfig=list)
    for name in _MISSING:
        if name in sys.modules:
            continue
        try:
            importlib.import_module(name)
        except Exception:
            _stub(name)
    # transformers ≥4.31 moved these helpers to pytorch_utils; the reference's
    # vendored Qformer.py imports them from modeling_utils — re-export
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def remove_path() -> None:
    """Drop the reference root from sys.path (its modules stay cached in
    sys.modules, which is all the already-built oracle model needs) so the
    reference's top-level `config`/`toolkit` packages cannot shadow later
    imports, and UNINSTALL the stub modules — our own code probes some of
    the same names (e.g. media.py's decord ladder) and must see the real
    ImportError, not an inert stub."""
    if REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)
    for name in _INSTALLED:
        if isinstance(sys.modules.get(name), _AnyModule):
            del sys.modules[name]
    _INSTALLED.clear()
