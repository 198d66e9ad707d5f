"""Module-level wrapper exposing a proto enum's values by name/number."""

from __future__ import annotations


class EnumTypeWrapper:
    def __init__(self, enum_desc) -> None:  # noqa: ANN001
        self.DESCRIPTOR = enum_desc
        for v in enum_desc.values:
            setattr(self, v.name, v.number)

    def Value(self, name: str) -> int:
        return self.DESCRIPTOR.values_by_name[name].number

    def Name(self, number: int) -> str:
        return self.DESCRIPTOR.values_by_number[number].name

    def keys(self):  # noqa: ANN201
        return [v.name for v in self.DESCRIPTOR.values]

    def values(self):  # noqa: ANN201
        return [v.number for v in self.DESCRIPTOR.values]

    def items(self):  # noqa: ANN201
        return [(v.name, v.number) for v in self.DESCRIPTOR.values]
