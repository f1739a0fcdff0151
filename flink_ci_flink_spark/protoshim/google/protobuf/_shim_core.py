"""Core of the minimal protobuf runtime shim: wire-format codec, descriptor
model, FileDescriptorProto parsing, and dynamic message class generation.

Everything here is an original implementation of the PUBLIC protobuf
encoding spec (https://protobuf.dev/programming-guides/encoding/) and the
descriptor.proto schema (field numbers are part of the public spec).
"""

from __future__ import annotations

import struct

# --- field type / label constants (descriptor.proto FieldDescriptorProto) ---

TYPE_DOUBLE = 1
TYPE_FLOAT = 2
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_FIXED64 = 6
TYPE_FIXED32 = 7
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_GROUP = 10
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14
TYPE_SFIXED32 = 15
TYPE_SFIXED64 = 16
TYPE_SINT32 = 17
TYPE_SINT64 = 18

LABEL_OPTIONAL = 1
LABEL_REQUIRED = 2
LABEL_REPEATED = 3

_VARINT_TYPES = {
    TYPE_INT64,
    TYPE_UINT64,
    TYPE_INT32,
    TYPE_UINT32,
    TYPE_BOOL,
    TYPE_ENUM,
    TYPE_SINT32,
    TYPE_SINT64,
}
_FIXED64_TYPES = {TYPE_DOUBLE, TYPE_FIXED64, TYPE_SFIXED64}
_FIXED32_TYPES = {TYPE_FLOAT, TYPE_FIXED32, TYPE_SFIXED32}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _wire_type(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return _WT_VARINT
    if ftype in _FIXED64_TYPES:
        return _WT_I64
    if ftype in _FIXED32_TYPES:
        return _WT_I32
    if ftype in _LEN_TYPES:
        return _WT_LEN
    raise NotImplementedError(f"protoshim: unsupported field type {ftype}")


# --- varint codec ---


def encode_varint(value: int, out: bytearray) -> None:
    if value < 0:
        value &= (1 << 64) - 1  # two's-complement 64-bit, 10-byte encoding
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("protoshim: truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("protoshim: varint too long")


def _zigzag_encode(value: int) -> int:
    return (value << 1) ^ (value >> 63)


def _zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _to_signed32(value: int) -> int:
    value &= (1 << 32) - 1
    return value - (1 << 32) if value >= (1 << 31) else value


# --- descriptor model ---


class FieldDescriptor:
    def __init__(
        self,
        name: str,
        number: int,
        ftype: int,
        label: int,
        type_name: str = "",
        oneof_index: int | None = None,
        proto3_optional: bool = False,
    ):
        self.name = name
        self.number = number
        self.type = ftype
        self.label = label
        self.type_name = type_name  # ".pkg.Message" for message/enum fields
        self.oneof_index = oneof_index
        self.proto3_optional = proto3_optional
        self.message_type: Descriptor | None = None  # resolved lazily

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    @property
    def has_presence(self) -> bool:
        """proto3 explicit presence: message fields, oneof members (incl.
        the synthetic oneofs proto3 `optional` compiles to)."""
        return (
            self.type == TYPE_MESSAGE
            or self.oneof_index is not None
            or self.proto3_optional
        )

    def default(self):
        if self.is_repeated:
            return []
        if self.type in (TYPE_STRING,):
            return ""
        if self.type == TYPE_BYTES:
            return b""
        if self.type == TYPE_BOOL:
            return False
        if self.type in (TYPE_DOUBLE, TYPE_FLOAT):
            return 0.0
        if self.type == TYPE_MESSAGE:
            return None
        return 0


class OneofDescriptor:
    def __init__(self, name: str):
        self.name = name


class EnumDescriptor:
    def __init__(self, name: str, full_name: str, values: list[tuple[str, int]]):
        self.name = name
        self.full_name = full_name
        self.values = values  # [(name, number)]


class Descriptor:
    def __init__(
        self,
        name: str,
        full_name: str,
        fields: list[FieldDescriptor],
        nested_types: list["Descriptor"],
        enum_types: list[EnumDescriptor],
        oneofs: list[OneofDescriptor],
    ):
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.nested_types = nested_types
        self.enum_types = enum_types
        self.oneofs = oneofs
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self._message_class: type | None = None


class FileDescriptor:
    def __init__(
        self,
        name: str,
        package: str,
        message_types: list[Descriptor],
        enum_types: list[EnumDescriptor],
        pool: "DescriptorPoolShim",
    ):
        self.name = name
        self.package = package
        self.message_types_by_name = {d.name: d for d in message_types}
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.pool = pool


# --- generic wire reader used to parse FileDescriptorProto ---


def _read_fields(data: bytes) -> list[tuple[int, int, object]]:
    """Decode a wire message into [(field_number, wire_type, raw_value)]."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = decode_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            val, pos = decode_varint(data, pos)
        elif wt == _WT_I64:
            val = data[pos : pos + 8]
            pos += 8
        elif wt == _WT_LEN:
            ln, pos = decode_varint(data, pos)
            val = data[pos : pos + ln]
            pos += ln
        elif wt == _WT_I32:
            val = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"protoshim: unsupported wire type {wt}")
        out.append((num, wt, val))
    return out


def _parse_field_descriptor(data: bytes) -> FieldDescriptor:
    name = ""
    number = 0
    label = LABEL_OPTIONAL
    ftype = 0
    type_name = ""
    oneof_index: int | None = None
    proto3_optional = False
    for num, _wt, val in _read_fields(data):
        if num == 1:
            name = val.decode()
        elif num == 3:
            number = val
        elif num == 4:
            label = val
        elif num == 5:
            ftype = val
        elif num == 6:
            type_name = val.decode()
        elif num == 9:
            oneof_index = val
        elif num == 17:
            proto3_optional = bool(val)
    return FieldDescriptor(
        name, number, ftype, label, type_name, oneof_index, proto3_optional
    )


def _parse_enum_descriptor(data: bytes, prefix: str) -> EnumDescriptor:
    name = ""
    values: list[tuple[str, int]] = []
    for num, _wt, val in _read_fields(data):
        if num == 1:
            name = val.decode()
        elif num == 2:
            vname, vnum = "", 0
            for n2, _w2, v2 in _read_fields(val):
                if n2 == 1:
                    vname = v2.decode()
                elif n2 == 2:
                    vnum = v2
            values.append((vname, vnum))
    return EnumDescriptor(name, f"{prefix}.{name}", values)


def _parse_descriptor(data: bytes, prefix: str) -> Descriptor:
    name = ""
    fields: list[FieldDescriptor] = []
    nested: list[Descriptor] = []
    enums: list[EnumDescriptor] = []
    oneofs: list[OneofDescriptor] = []
    raw = _read_fields(data)
    for num, _wt, val in raw:
        if num == 1:
            name = val.decode()
    full = f"{prefix}.{name}"
    for num, _wt, val in raw:
        if num == 2:
            fields.append(_parse_field_descriptor(val))
        elif num == 3:
            nested.append(_parse_descriptor(val, full))
        elif num == 4:
            enums.append(_parse_enum_descriptor(val, full))
        elif num == 8:
            oname = ""
            for n2, _w2, v2 in _read_fields(val):
                if n2 == 1:
                    oname = v2.decode()
            oneofs.append(OneofDescriptor(oname))
    return Descriptor(name, full, fields, nested, enums, oneofs)


# --- descriptor pool ---


class DescriptorPoolShim:
    def __init__(self):
        self._messages_by_full_name: dict[str, Descriptor] = {}
        self._enums_by_full_name: dict[str, EnumDescriptor] = {}

    def _register(self, d: Descriptor) -> None:
        self._messages_by_full_name[d.full_name] = d
        for nd in d.nested_types:
            self._register(nd)
        for e in d.enum_types:
            self._enums_by_full_name[e.full_name] = e

    def AddSerializedFile(self, data: bytes) -> FileDescriptor:
        fname = ""
        package = ""
        raw = _read_fields(data)
        for num, _wt, val in raw:
            if num == 1:
                fname = val.decode()
            elif num == 2:
                package = val.decode()
        messages: list[Descriptor] = []
        enums: list[EnumDescriptor] = []
        for num, _wt, val in raw:
            if num == 4:
                messages.append(_parse_descriptor(val, f".{package}"))
            elif num == 5:
                enums.append(_parse_enum_descriptor(val, f".{package}"))
        for d in messages:
            self._register(d)
        for e in enums:
            self._enums_by_full_name[e.full_name] = e
        return FileDescriptor(fname, package, messages, enums, self)

    def resolve_message(self, type_name: str) -> Descriptor:
        d = self._messages_by_full_name.get(type_name)
        if d is None:
            raise KeyError(f"protoshim: unresolved message type {type_name}")
        return d

    def is_enum(self, type_name: str) -> bool:
        return type_name in self._enums_by_full_name


_DEFAULT_POOL = DescriptorPoolShim()


def default_pool() -> DescriptorPoolShim:
    return _DEFAULT_POOL


# --- dynamic message runtime ---


class _RepeatedField(list):
    """Repeated-field container that commits its owning message into the
    parent chain on first mutation, so `msg.sub.items.append(x)` sticks
    exactly like real protobuf (reading alone never marks presence)."""

    __slots__ = ("_owner",)

    def __init__(self, owner):
        super().__init__()
        self._owner = owner

    def append(self, item):
        super().append(item)
        self._owner._attach()

    def extend(self, items):
        super().extend(items)
        self._owner._attach()

    def insert(self, index, item):
        super().insert(index, item)
        self._owner._attach()


class ShimMessage:
    """Base for generated message classes. Field values live in
    `self._values` (presence = key present); attribute access falls back to
    proto3 defaults. Supports kwargs construction, SerializeToString,
    ParseFromString, repeated fields, sub-messages, oneof clearing.

    Submessage access auto-vivifies like real protobuf: reading an unset
    message field returns a LIVE view (same instance each read, cached in
    `_views`) that is linked to its parent and commits itself — and every
    unattached ancestor — into `_values` on the first WRITE anywhere in the
    subtree. Reading alone never marks presence, so `HasField` and
    serialization semantics match the real runtime; nested writes such as
    `cmd.ttl.durationMs = 9` are never silently dropped."""

    DESCRIPTOR: Descriptor = None  # set on subclasses
    _POOL: DescriptorPoolShim = None

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_views", {})
        object.__setattr__(self, "_parent", None)
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    # -- attribute protocol --

    def __getattr__(self, name):
        # only called when not found on the instance/class
        desc = type(self).DESCRIPTOR
        f = desc.fields_by_name.get(name) if desc else None
        if f is None:
            raise AttributeError(
                f"{desc.full_name if desc else type(self).__name__} has no field {name!r}"
            )
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if f.is_repeated:
            lst = _RepeatedField(self)
            values[name] = lst  # auto-vivify so .append() sticks
            return lst
        if f.type == TYPE_MESSAGE:
            # Live parent-linked view: repeated reads return the same
            # instance; a write anywhere below attaches the whole chain.
            views = self.__dict__.setdefault("_views", {})
            child = views.get(name)
            if child is None:
                child = _message_class_for(f, type(self)._POOL)()
                object.__setattr__(child, "_parent", (self, f))
                views[name] = child
            return child
        return f.default()

    def _attach(self) -> None:
        """Commit this message into its parent's `_values` (and recursively
        up the chain) the first time it is written to. No-op when already
        attached or top-level."""
        parent = self.__dict__.get("_parent")
        if parent is None:
            return
        object.__setattr__(self, "_parent", None)
        pmsg, f = parent
        pvalues = pmsg.__dict__["_values"]
        # real oneofs: attaching one member clears the others
        if f.oneof_index is not None and not f.proto3_optional:
            for other in type(pmsg).DESCRIPTOR.fields:
                if (
                    other.name != f.name
                    and other.oneof_index == f.oneof_index
                    and not other.proto3_optional
                    and other.name in pvalues
                ):
                    del pvalues[other.name]
        pvalues[f.name] = self
        pmsg.__dict__.get("_views", {}).pop(f.name, None)
        pmsg._attach()

    def __setattr__(self, name, value):
        desc = type(self).DESCRIPTOR
        f = desc.fields_by_name.get(name)
        if f is None:
            raise AttributeError(f"{desc.full_name} has no field {name!r}")
        values = self.__dict__["_values"]
        if f.is_repeated:
            value = list(value)
        elif f.type == TYPE_MESSAGE:
            cls = _message_class_for(f, type(self)._POOL)
            if not isinstance(value, cls):
                raise TypeError(
                    f"field {name} expects {cls.__name__}, got {type(value).__name__}"
                )
        elif f.type == TYPE_BOOL:
            value = bool(value)
        elif f.type == TYPE_STRING:
            if not isinstance(value, str):
                raise TypeError(f"field {name} expects str")
        elif f.type == TYPE_BYTES:
            if not isinstance(value, (bytes, bytearray, memoryview)):
                raise TypeError(f"field {name} expects bytes")
            value = bytes(value)
        elif f.type in _VARINT_TYPES or f.type in _FIXED64_TYPES | _FIXED32_TYPES:
            if f.type in (TYPE_DOUBLE, TYPE_FLOAT):
                value = float(value)
            else:
                value = int(value)
        # real oneofs: setting one member clears the others
        if f.oneof_index is not None and not f.proto3_optional:
            for other in desc.fields:
                if (
                    other.name != f.name
                    and other.oneof_index == f.oneof_index
                    and not other.proto3_optional
                    and other.name in values
                ):
                    del values[other.name]
        if isinstance(value, ShimMessage):
            # direct assignment severs any stale parent link so a later
            # write can't attach the instance somewhere it no longer lives
            object.__setattr__(value, "_parent", None)
        values[name] = value
        self.__dict__.get("_views", {}).pop(name, None)
        self._attach()

    # -- serialization --

    def SerializeToString(self) -> bytes:
        out = bytearray()
        desc = type(self).DESCRIPTOR
        values = self.__dict__["_values"]
        for f in sorted(desc.fields, key=lambda x: x.number):
            if f.name not in values:
                continue
            v = values[f.name]
            if f.is_repeated:
                for item in v:
                    self._encode_one(out, f, item)
            else:
                if not f.has_presence and v == f.default():
                    continue  # proto3: default-valued plain scalars are omitted
                self._encode_one(out, f, v)
        return bytes(out)

    def _encode_one(self, out: bytearray, f: FieldDescriptor, v) -> None:
        tag = (f.number << 3) | _wire_type(f.type)
        encode_varint(tag, out)
        t = f.type
        if t in (TYPE_SINT32, TYPE_SINT64):
            encode_varint(_zigzag_encode(int(v)), out)
        elif t in _VARINT_TYPES:
            encode_varint(int(v), out)
        elif t == TYPE_DOUBLE:
            out += struct.pack("<d", v)
        elif t == TYPE_FLOAT:
            out += struct.pack("<f", v)
        elif t in (TYPE_FIXED64, TYPE_SFIXED64):
            out += struct.pack("<q" if t == TYPE_SFIXED64 else "<Q", v)
        elif t in (TYPE_FIXED32, TYPE_SFIXED32):
            out += struct.pack("<i" if t == TYPE_SFIXED32 else "<I", v)
        elif t == TYPE_STRING:
            b = v.encode("utf-8")
            encode_varint(len(b), out)
            out += b
        elif t == TYPE_BYTES:
            encode_varint(len(v), out)
            out += v
        elif t == TYPE_MESSAGE:
            b = v.SerializeToString()
            encode_varint(len(b), out)
            out += b
        else:
            raise NotImplementedError(f"protoshim: cannot encode type {t}")

    # -- parsing --

    def ParseFromString(self, data: bytes) -> int:
        self.__dict__["_values"].clear()
        self.__dict__.setdefault("_views", {}).clear()
        self.MergeFromString(data)
        return len(data)

    def MergeFromString(self, data: bytes) -> int:
        desc = type(self).DESCRIPTOR
        pool = type(self)._POOL
        values = self.__dict__["_values"]
        pos = 0
        n = len(data)
        while pos < n:
            tag, pos = decode_varint(data, pos)
            num, wt = tag >> 3, tag & 7
            f = desc.fields_by_number.get(num)
            if f is None:
                pos = _skip(data, pos, wt)
                continue
            if wt == _WT_LEN:
                ln, pos = decode_varint(data, pos)
                chunk = data[pos : pos + ln]
                pos += ln
                if f.type == TYPE_MESSAGE:
                    sub = _message_class_for(f, pool)()
                    sub.MergeFromString(chunk)
                    if f.is_repeated:
                        values.setdefault(f.name, []).append(sub)
                    else:
                        values[f.name] = sub
                elif f.type == TYPE_STRING:
                    s = chunk.decode("utf-8")
                    if f.is_repeated:
                        values.setdefault(f.name, []).append(s)
                    else:
                        values[f.name] = s
                elif f.type == TYPE_BYTES:
                    b = bytes(chunk)
                    if f.is_repeated:
                        values.setdefault(f.name, []).append(b)
                    else:
                        values[f.name] = b
                elif f.is_repeated and f.type in _VARINT_TYPES:
                    # packed repeated varints
                    p2 = 0
                    lst = values.setdefault(f.name, [])
                    while p2 < len(chunk):
                        raw, p2 = decode_varint(chunk, p2)
                        lst.append(_decode_int(f.type, raw))
                else:
                    raise ValueError(
                        f"protoshim: unexpected LEN payload for field {f.name}"
                    )
            elif wt == _WT_VARINT:
                raw, pos = decode_varint(data, pos)
                v = _decode_int(f.type, raw)
                if f.is_repeated:
                    values.setdefault(f.name, []).append(v)
                else:
                    values[f.name] = v
            elif wt == _WT_I64:
                chunk = data[pos : pos + 8]
                pos += 8
                v = _decode_fixed(f.type, chunk)
                if f.is_repeated:
                    values.setdefault(f.name, []).append(v)
                else:
                    values[f.name] = v
            elif wt == _WT_I32:
                chunk = data[pos : pos + 4]
                pos += 4
                v = _decode_fixed(f.type, chunk)
                if f.is_repeated:
                    values.setdefault(f.name, []).append(v)
                else:
                    values[f.name] = v
            else:
                pos = _skip(data, pos, wt)
        if values:
            # merging real content into an auto-vivified view (e.g.
            # `msg.sub.CopyFrom(x)`) marks it present, like real protobuf
            self._attach()
        return n

    # -- conveniences mirroring the real API surface we rely on --

    def HasField(self, name: str) -> bool:
        f = type(self).DESCRIPTOR.fields_by_name[name]
        if f.is_repeated or not f.has_presence:
            raise ValueError(f"HasField not valid for field {name}")
        return name in self.__dict__["_values"]

    def CopyFrom(self, other: "ShimMessage") -> None:
        self.ParseFromString(other.SerializeToString())

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )

    def __repr__(self):
        vals = ", ".join(f"{k}={v!r}" for k, v in self.__dict__["_values"].items())
        return f"{type(self).__name__}({vals})"


def _decode_int(ftype: int, raw: int):
    if ftype == TYPE_BOOL:
        return bool(raw)
    if ftype == TYPE_SINT32 or ftype == TYPE_SINT64:
        return _zigzag_decode(raw)
    if ftype in (TYPE_INT64,):
        return _to_signed64(raw)
    if ftype in (TYPE_INT32, TYPE_ENUM):
        return _to_signed32(raw) if raw >= (1 << 31) else _to_signed64(raw)
    return raw  # uint32/uint64


def _decode_fixed(ftype: int, chunk: bytes):
    if ftype == TYPE_DOUBLE:
        return struct.unpack("<d", chunk)[0]
    if ftype == TYPE_FLOAT:
        return struct.unpack("<f", chunk)[0]
    if ftype == TYPE_FIXED64:
        return struct.unpack("<Q", chunk)[0]
    if ftype == TYPE_SFIXED64:
        return struct.unpack("<q", chunk)[0]
    if ftype == TYPE_FIXED32:
        return struct.unpack("<I", chunk)[0]
    if ftype == TYPE_SFIXED32:
        return struct.unpack("<i", chunk)[0]
    raise NotImplementedError(f"protoshim: fixed decode for type {ftype}")


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = decode_varint(data, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_LEN:
        ln, pos = decode_varint(data, pos)
        return pos + ln
    if wt == _WT_I32:
        return pos + 4
    raise ValueError(f"protoshim: cannot skip wire type {wt}")


def _message_class_for(f: FieldDescriptor, pool: DescriptorPoolShim) -> type:
    if f.message_type is None:
        f.message_type = pool.resolve_message(f.type_name)
    return message_class(f.message_type, pool)


def message_class(desc: Descriptor, pool: DescriptorPoolShim) -> type:
    """Get (or build) the message class bound to a Descriptor."""
    if desc._message_class is None:
        desc._message_class = type(
            desc.name, (ShimMessage,), {"DESCRIPTOR": desc, "_POOL": pool}
        )
    return desc._message_class
