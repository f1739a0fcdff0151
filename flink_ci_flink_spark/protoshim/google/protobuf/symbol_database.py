"""Shim symbol_database: generated modules only call Default()."""

from ._shim_core import default_pool


class _SymbolDatabase:
    @property
    def pool(self):
        return default_pool()


_DEFAULT = _SymbolDatabase()


def Default() -> _SymbolDatabase:
    return _DEFAULT
