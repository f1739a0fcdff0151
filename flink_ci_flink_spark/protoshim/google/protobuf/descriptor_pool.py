"""Shim descriptor_pool: Default() pool with AddSerializedFile()."""

from ._shim_core import DescriptorPoolShim, default_pool  # noqa: F401


def Default() -> DescriptorPoolShim:
    return default_pool()
