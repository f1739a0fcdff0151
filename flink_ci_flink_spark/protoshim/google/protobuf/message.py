"""Shim message module: the Message base class (isinstance surface)."""

from ._shim_core import ShimMessage as Message  # noqa: F401
