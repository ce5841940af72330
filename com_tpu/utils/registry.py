"""Name → class registries.

The reference looks components up by NAME in per-module ``__all__`` dicts
(pcdet/datasets/__init__.py:16-24, pcdet/models/detectors/__init__.py:15-29).
We centralize that pattern in a tiny Registry class so every subsystem
(datasets, detectors, VFEs, heads, augmentor steps, processors) registers
itself with a decorator.
"""
from __future__ import annotations


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: dict[str, object] = {}

    def register(self, obj=None, *, name: str | None = None):
        def deco(o):
            key = name or o.__name__
            if key in self._entries:
                raise KeyError(f"{key} already registered in {self.name}")
            self._entries[key] = o
            return o

        if obj is None:
            return deco
        return deco(obj)

    def get(self, key: str):
        if key not in self._entries:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}; "
                f"available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key):
        return key in self._entries

    def keys(self):
        return sorted(self._entries)


DATASETS = Registry("datasets")
DETECTORS = Registry("detectors")
VFES = Registry("vfe")
MAP_TO_BEV = Registry("map_to_bev")
BACKBONES_2D = Registry("backbones_2d")
BACKBONES_3D = Registry("backbones_3d")
DENSE_HEADS = Registry("dense_heads")
ROI_HEADS = Registry("roi_heads")
AUGMENTORS = Registry("augmentors")
