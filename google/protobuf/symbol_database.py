"""Symbol database — a registry mapping full names to message classes."""

from __future__ import annotations


class SymbolDatabase:
    def __init__(self) -> None:
        self._classes: dict[str, type] = {}

    def RegisterMessage(self, cls: type) -> type:
        self._classes[cls.DESCRIPTOR.full_name] = cls
        return cls

    def RegisterFileDescriptor(self, fd) -> None:  # noqa: ANN001
        return None

    def GetSymbol(self, full_name: str) -> type:
        return self._classes[full_name]


_default = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _default
