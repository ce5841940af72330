"""Load reference pcdet torch modules from /root/reference on CPU.

Shared helper for whole-model parity tests: registers stub packages whose
``__path__`` points at the real reference directories, so ordinary imports
load the real module files while the native deps (CUDA extensions, numba,
SharedArray) resolve to stubs.  ``torch.Tensor.cuda`` is patched to a no-op
inside the context (CenterHead.__init__ calls ``.cuda()`` on its class-id
mapping, center_head.py:67-70).
"""
from __future__ import annotations

import contextlib
import importlib
import sys
import types
from pathlib import Path

REF = Path("/root/reference/pcdet")

_PKG_DIRS = {
    "pcdet": REF,
    "pcdet.utils": REF / "utils",
    "pcdet.models": REF / "models",
    "pcdet.models.model_utils": REF / "models/model_utils",
    "pcdet.models.backbones_3d": REF / "models/backbones_3d",
    "pcdet.models.backbones_3d.vfe": REF / "models/backbones_3d/vfe",
    "pcdet.models.backbones_2d": REF / "models/backbones_2d",
    "pcdet.models.backbones_2d.map_to_bev": REF / "models/backbones_2d/map_to_bev",
    "pcdet.models.dense_heads": REF / "models/dense_heads",
    "pcdet.models.dense_heads.target_assigner": REF / "models/dense_heads/target_assigner",
    "pcdet.models.detectors": REF / "models/detectors",
    "pcdet.models.backbones_3d.pfe": REF / "models/backbones_3d/pfe",
    "pcdet.models.roi_heads": REF / "models/roi_heads",
    "pcdet.models.roi_heads.target_assigner":
        REF / "models/roi_heads/target_assigner",
    "pcdet.ops": REF / "ops",
    "pcdet.ops.iou3d_nms": REF / "ops/iou3d_nms",
    "pcdet.ops.roiaware_pool3d": REF / "ops/roiaware_pool3d",
    "pcdet.ops.pointnet2": REF / "ops/pointnet2",
    "pcdet.ops.pointnet2.pointnet2_stack": REF / "ops/pointnet2/pointnet2_stack",
    "pcdet.ops.pointnet2.pointnet2_batch": REF / "ops/pointnet2/pointnet2_batch",
    "pcdet.ops.roipoint_pool3d": REF / "ops/roipoint_pool3d",
}


class AttrDict(dict):
    """Minimal EasyDict substitute (attribute access, recursive)."""

    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)


def _numba_stub():
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    mod.jit = jit
    mod.njit = jit
    mod.prange = range
    return mod


@contextlib.contextmanager
def reference_modules(*names):
    """Import real reference modules by dotted name with native deps stubbed.

    Yields a dict {name: module}.  sys.modules is restored on exit so other
    tests' own pcdet stubs are unaffected.
    """
    import torch

    stubs = {}
    for pkg, path in _PKG_DIRS.items():
        mod = types.ModuleType(pkg)
        mod.__path__ = [str(path)]
        stubs[pkg] = mod
    stubs["numba"] = _numba_stub()
    stubs["SharedArray"] = types.ModuleType("SharedArray")
    # native extension leaf modules (never executed in CPU forward paths)
    for leaf in ("pcdet.ops.iou3d_nms.iou3d_nms_utils",
                 "pcdet.ops.iou3d_nms.iou3d_nms_cuda",
                 "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils",
                 "pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
                 "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda",
                 "pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda",
                 "pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda"):
        stubs[leaf] = types.ModuleType(leaf)
        parent, _, attr = leaf.rpartition(".")
        setattr(stubs[parent], attr, stubs[leaf])

    tracked = set(stubs) | set(names)
    saved = {k: sys.modules.get(k) for k in tracked}
    extra_loaded = []
    sys.modules.update(stubs)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference targets numpy<1.24 (np.int alias usage,
    # base_bev_backbone.py:60); shim it for the loaded modules
    import numpy as np
    had_np_int = hasattr(np, "int")
    if not had_np_int:
        np.int = int
    before = set(sys.modules)
    try:
        out = {}
        for name in names:
            out[name] = importlib.import_module(name)
        extra_loaded = [k for k in sys.modules
                        if k.startswith("pcdet") and k not in before
                        and k not in tracked]
        yield out
    finally:
        torch.Tensor.cuda = orig_cuda
        if not had_np_int and hasattr(np, "int"):
            del np.int
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in extra_loaded:
            sys.modules.pop(k, None)
