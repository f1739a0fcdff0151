"""Shim descriptor module: the constants and classes generated pb2 modules
reference. `_USE_C_DESCRIPTORS` is False — the pure-Python path."""

from ._shim_core import (  # noqa: F401
    Descriptor,
    EnumDescriptor,
    FieldDescriptor,
    FileDescriptor,
    OneofDescriptor,
)

_USE_C_DESCRIPTORS = False
