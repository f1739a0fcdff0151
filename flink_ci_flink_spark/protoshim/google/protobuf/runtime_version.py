"""Shim runtime_version: generated modules validate the runtime version at
import; the shim accepts any (its wire codec is version-independent)."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
