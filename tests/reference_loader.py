"""Import the read-only PyTorch reference for golden-parity testing.

The reference imports several packages absent from this image (librosa,
torchaudio, torchvision, ...). They are only needed for data/visualization
paths, not for the nn.Module math we compare against, so we register inert
stub modules before importing. The reference code itself is executed ONLY
inside tests, with random weights, to produce golden outputs.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REF_PATH = "/root/reference"

_STUBS = {
    "librosa": ["load", "onset"],
    "librosa.onset": ["onset_detect"],
    "torchaudio": [],
    "torchaudio.functional": [],
    "torchaudio.sox_effects": ["apply_effects_tensor"],
    "torchaudio.transforms": ["MFCC", "MelSpectrogram"],
    "torchvision": [],
    "torchvision.transforms": [],
    "torchvision.datasets": [],
    "matplotlib": [],
    "matplotlib.pyplot": [],
    "textgrid": ["TextGrid"],
    "interval": ["Interval"],
    "essentia": [],
    "essentia.standard": [],
    "smplx": ["create"],
    "pyrender": [],
    "trimesh": [],
    "cv2": [],
}


def _ensure_stubs():
    for name, attrs in _STUBS.items():
        if name in sys.modules and not isinstance(sys.modules[name], types.ModuleType):
            continue
        try:
            __import__(name)
            continue  # actually available
        except Exception:
            pass
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.__path__ = []  # behave as a package for submodule imports
        for a in attrs:
            setattr(mod, a, type(a, (), {}))
        sys.modules[name] = mod
        if "." in name:
            parent, child = name.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, mod)


def _patch_cuda_to_cpu():
    """The reference hardcodes .to('cuda') at module scope
    (PTransformer.py:16) — remap cuda moves to no-ops on this CPU image."""
    import torch

    if getattr(torch.Tensor.to, "_ptlk_patched", False):
        return
    orig_to = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], (str, torch.device)) and "cuda" in str(args[0]):
            args = ("cpu",) + args[1:]
        if "cuda" in str(kwargs.get("device", "")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    to._ptlk_patched = True
    torch.Tensor.to = to
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        # the reference's timed infer paths call cuda.synchronize directly
        torch.cuda.synchronize = lambda *a, **k: None
        # ... and create tensors with device="cuda" literals
        # (PTransformer.py:597 etc.) — remap factory device kwargs to cpu
        for fname in ("zeros", "ones", "empty", "full", "tensor", "arange",
                      "randn", "rand", "randint", "linspace", "eye"):
            orig = getattr(torch, fname)
            if getattr(orig, "_ptlk_patched", False):
                continue

            def make(orig):
                def fn(*args, **kwargs):
                    if "cuda" in str(kwargs.get("device", "")):
                        kwargs["device"] = "cpu"
                    return orig(*args, **kwargs)
                fn._ptlk_patched = True
                return fn

            setattr(torch, fname, make(orig))


def load_reference():
    """-> the reference repo root importable; returns True if usable."""
    import os

    if not os.path.isdir(REF_PATH):
        return False
    _ensure_stubs()
    _patch_cuda_to_cpu()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    return True


def patch_torch2_compat():
    """The reference targets torch 1.12; torch>=2 TransformerDecoder passes
    tgt_is_causal/memory_is_causal kwargs its custom layer doesn't accept."""
    pt = ref_import("nets.inpainting.PTransformer")
    orig = pt.DeepSupervisionLayer.forward
    if getattr(orig, "_ptlk", False):
        return
    def forward(self, *args, **kw):
        kw.pop("tgt_is_causal", None)
        kw.pop("memory_is_causal", None)
        return orig(self, *args, **kw)
    forward._ptlk = True
    pt.DeepSupervisionLayer.forward = forward


def patch_tf_convs():
    """torch>=2 validates padding strings in Conv init, rejecting the
    reference's uppercase 'SAME'/'VALID' (Conv{1,2}d_tf pass them through
    to nn.Conv*, speech2gesture.py:24-118). Re-init with padding=0 and
    restore the string attr afterwards — the TF-style forward only reads
    the string."""
    import torch

    s2g = ref_import("nets.speech2gesture")
    s2gl = ref_import("nets.spg.s2glayers")   # defines its OWN tf-convs
    for cls, base in ((s2g.Conv1d_tf, torch.nn.Conv1d),
                      (s2g.Conv2d_tf, torch.nn.Conv2d),
                      (s2gl.Conv1d_tf, torch.nn.Conv1d),
                      (s2gl.Conv2d_tf, torch.nn.Conv2d)):
        if getattr(cls.__init__, "_ptlk", False):
            continue

        def make_init(base):
            def init(self, *args, **kwargs):
                pad = kwargs.get("padding", "SAME")
                kw = dict(kwargs)
                if isinstance(pad, str):
                    kw["padding"] = 0
                base.__init__(self, *args, **kw)
                self.padding = pad
            init._ptlk = True
            return init

        cls.__init__ = make_init(base)


def ref_import(name: str):
    """Import a reference module with cwd set to the reference root (it
    opens data files like 'data_utils/hand_component.json' relative to cwd
    at import time, mesh_dataset.py:22)."""
    import importlib
    import os

    cwd = os.getcwd()
    os.chdir(REF_PATH)
    try:
        return importlib.import_module(name)
    finally:
        os.chdir(cwd)
