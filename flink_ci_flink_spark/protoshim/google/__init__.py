# Namespace package root for the vendored minimal protobuf runtime shim.
# See google/protobuf/__init__.py for scope and caveats.
