"""Shim of google.protobuf.internal.builder: the two hooks generated pb2
modules call to materialize descriptors and message classes into their
module globals.

Naming convention (matches generated-code expectations): each message/enum
descriptor lands in globals under `_UPPERCASED_FULL_PATH` (nested types
join with `_`), message classes under their proto names, top-level enum
VALUE names are injected directly (proto enum values share the enclosing
scope in proto2/proto3 semantics — `stateMessage.PRE_INIT`)."""

from __future__ import annotations

from .._shim_core import (
    Descriptor,
    EnumDescriptor,
    FileDescriptor,
    message_class,
)


def _walk_messages(d: Descriptor, path: str):
    yield path, d
    for nd in d.nested_types:
        yield from _walk_messages(nd, f"{path}_{nd.name.upper()}")


def BuildMessageAndEnumDescriptors(file_desc: FileDescriptor, module_globals: dict):
    for top in file_desc.message_types_by_name.values():
        for path, d in _walk_messages(top, f"_{top.name.upper()}"):
            module_globals[path] = d
            for e in d.enum_types:
                module_globals[f"{path}_{e.name.upper()}"] = e
    for e in file_desc.enum_types_by_name.values():
        module_globals[f"_{e.name.upper()}"] = e


class _ShimEnumType:
    """Module-level enum wrapper: value names as attributes, plus the
    Value()/Name() lookups of the real EnumTypeWrapper."""

    def __init__(self, desc: EnumDescriptor):
        self.DESCRIPTOR = desc
        self._by_name = dict(desc.values)
        self._by_number = {n: v for v, n in desc.values}
        for vname, vnum in desc.values:
            setattr(self, vname, vnum)

    def Value(self, name: str) -> int:
        return self._by_name[name]

    def Name(self, number: int) -> str:
        return self._by_number[number]


def BuildTopDescriptorsAndMessages(
    file_desc: FileDescriptor, _module_name: str, module_globals: dict
):
    pool = file_desc.pool

    def build(d: Descriptor) -> type:
        cls = message_class(d, pool)
        for nd in d.nested_types:
            setattr(cls, nd.name, build(nd))
        for e in d.enum_types:
            wrapper = _ShimEnumType(e)
            setattr(cls, e.name, wrapper)
            for vname, vnum in e.values:
                setattr(cls, vname, vnum)
        return cls

    for top in file_desc.message_types_by_name.values():
        module_globals[top.name] = build(top)
    for e in file_desc.enum_types_by_name.values():
        wrapper = _ShimEnumType(e)
        module_globals[e.name] = wrapper
        for vname, vnum in e.values:
            module_globals[vname] = vnum
