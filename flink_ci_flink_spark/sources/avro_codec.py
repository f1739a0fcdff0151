"""Minimal Avro binary codec (Apache Avro 1.x spec, records of primitives).

Reference surface: `flink-formats/flink-avro/.../AvroRowDeserializationSchema
.java` / `AvroRowSerializationSchema.java`. The container image bundles
neither spark-avro nor a Python avro library, so `decode_avro` falls back to
this vendored decoder — implemented straight from the public Avro binary
encoding spec (zigzag varints, little-endian IEEE floats, length-prefixed
bytes/strings): https://avro.apache.org/docs/1.11.1/specification/

Supported schema subset: a top-level record whose fields are primitives
(null, boolean, int, long, float, double, bytes, string) or two-branch
nullable unions ["null", <primitive>]. Nested records/arrays/maps raise
NotImplementedError — the reference's Rows-of-primitives usage maps to this
subset.

The Spark integration is an Arrow-batched pandas UDF over the binary
payload column (one Python pass per batch, not per row); prefer the JVM
`from_avro` whenever the spark-avro package is on the classpath.
"""

from __future__ import annotations

import json
import struct

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _parse_schema(json_schema: str | dict) -> dict:
    s = json.loads(json_schema) if isinstance(json_schema, str) else json_schema
    if not (isinstance(s, dict) and s.get("type") == "record"):
        raise NotImplementedError("only top-level record schemas are supported")
    for f in s["fields"]:
        t = f["type"]
        if isinstance(t, str):
            if t not in _PRIMITIVES:
                raise NotImplementedError(f"unsupported field type {t!r}")
        elif isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise NotImplementedError("only ['null', T] unions are supported")
            other = next(x for x in t if x != "null")
            if other not in _PRIMITIVES:
                raise NotImplementedError(f"unsupported union branch {other!r}")
        else:
            raise NotImplementedError("nested complex types are not supported")
    return s


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _zigzag_encode(value: int) -> bytes:
    acc = (value << 1) ^ (value >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_value(typ: str, buf: bytes, pos: int):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise NotImplementedError(typ)


def _encode_value(typ: str, value) -> bytes:
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if value else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(value))
    if typ == "float":
        return struct.pack("<f", float(value))
    if typ == "double":
        return struct.pack("<d", float(value))
    if typ in ("bytes", "string"):
        raw = value.encode("utf-8") if typ == "string" else bytes(value)
        return _zigzag_encode(len(raw)) + raw
    raise NotImplementedError(typ)


def decode_record(buf: bytes, schema: str | dict) -> dict:
    """Decode one Avro-binary record (no container framing) to a dict."""
    s = _parse_schema(schema)
    out, pos = {}, 0
    for f in s["fields"]:
        t = f["type"]
        if isinstance(t, list):  # nullable union: branch index then value
            idx, pos = _zigzag_decode(buf, pos)
            branch = t[idx]
            val, pos = _decode_value(branch, buf, pos)
        else:
            val, pos = _decode_value(t, buf, pos)
        out[f["name"]] = val
    return out


def encode_record(rec: dict, schema: str | dict) -> bytes:
    """Encode a dict as one Avro-binary record (test/round-trip helper)."""
    s = _parse_schema(schema)
    out = bytearray()
    for f in s["fields"]:
        t = f["type"]
        val = rec.get(f["name"])
        if isinstance(t, list):
            idx = t.index("null") if val is None else 1 - t.index("null")
            out += _zigzag_encode(idx)
            if val is not None:
                out += _encode_value(t[idx], val)
        else:
            out += _encode_value(t, val)
    return bytes(out)


_AVRO_TO_SPARK = {
    "null": "string",
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def spark_ddl_for(schema: str | dict) -> str:
    """Spark struct DDL equivalent of the (subset) Avro schema."""
    s = _parse_schema(schema)
    parts = []
    for f in s["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(x for x in t if x != "null")
        parts.append(f"{f['name']} {_AVRO_TO_SPARK[t]}")
    return ", ".join(parts)
