"""Minimal pure-Python protobuf runtime SHIM — original implementation of
the public Protocol Buffers wire format (https://protobuf.dev/programming-guides/encoding/),
NOT the google protobuf package.

Scope: exactly what generated `*_pb2.py` modules of the shape PySpark ships
(`pyspark/sql/streaming/proto/StateMessage_pb2.py`) need to import and run:

- descriptor_pool.Default().AddSerializedFile(serialized FileDescriptorProto)
- internal.builder.BuildMessageAndEnumDescriptors / BuildTopDescriptorsAndMessages
- message classes supporting kwargs construction, attribute get/set,
  SerializeToString(), ParseFromString(), repeated fields, sub-messages,
  enums-as-ints, proto3 presence for message/oneof/optional fields

Supported field types: int32/int64/uint32/uint64/bool/enum (varint),
string/bytes/message (length-delimited), double/float/fixed (for
completeness). Maps, groups, extensions, services, Any, and reflection
beyond the above are OUT of scope and raise.

This exists because the test image has no protobuf wheel and no network;
the only consumer is Spark's transformWithState state-server protocol,
whose peer is the JVM's real protobuf parser — wire-level round-trip
against it is covered by tests/test_tws.py.
"""

__version__ = "0.1.0-shim"
