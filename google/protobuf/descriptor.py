"""Descriptor objects — the schema model generated code hangs onto.

Only the attributes this repo's consumers touch are provided; all
objects accept arbitrary attribute assignment because generated pb2
modules pin bookkeeping like ``_serialized_start`` onto them.
"""

from __future__ import annotations

# Generated code checks this to decide between the C and Python paths.
_USE_C_DESCRIPTORS = False

# FieldDescriptorProto.Type values (descriptor.proto, public)
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

_SCALAR_DEFAULTS = {
    TYPE_DOUBLE: 0.0,
    TYPE_FLOAT: 0.0,
    TYPE_INT64: 0,
    TYPE_UINT64: 0,
    TYPE_INT32: 0,
    TYPE_FIXED64: 0,
    TYPE_FIXED32: 0,
    TYPE_BOOL: False,
    TYPE_STRING: "",
    TYPE_BYTES: b"",
    TYPE_UINT32: 0,
    TYPE_ENUM: 0,
    TYPE_SFIXED32: 0,
    TYPE_SFIXED64: 0,
    TYPE_SINT32: 0,
    TYPE_SINT64: 0,
}


class FieldDescriptor:
    def __init__(
        self,
        name: str,
        number: int,
        type: int,  # noqa: A002 - protobuf's own attribute name
        label: int,
        type_name: str = "",
        oneof_index: int | None = None,
        proto3_optional: bool = False,
    ) -> None:
        self.name = name
        self.number = number
        self.type = type
        self.label = label
        self.type_name = type_name  # fully-qualified, leading-dot form
        self.oneof_index = oneof_index
        self.proto3_optional = proto3_optional
        self.message_type: Descriptor | None = None  # linked later
        self.enum_type: EnumDescriptor | None = None
        self.containing_oneof: OneofDescriptor | None = None
        self.containing_type: Descriptor | None = None

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    @property
    def is_message(self) -> bool:
        return self.type == TYPE_MESSAGE

    @property
    def default_value(self):
        if self.is_repeated:
            return []
        if self.is_message:
            return None
        return _SCALAR_DEFAULTS[self.type]

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<FieldDescriptor {self.name}#{self.number} type={self.type}>"


class OneofDescriptor:
    def __init__(self, name: str) -> None:
        self.name = name
        self.fields: list[FieldDescriptor] = []


class EnumValueDescriptor:
    def __init__(self, name: str, number: int) -> None:
        self.name = name
        self.number = number


class EnumDescriptor:
    def __init__(self, name: str, full_name: str, values: list[EnumValueDescriptor]) -> None:
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number = {v.number: v for v in values}


class Descriptor:
    def __init__(
        self,
        name: str,
        full_name: str,
        fields: list[FieldDescriptor],
        oneofs: list[OneofDescriptor],
        nested_types: list["Descriptor"],
        enum_types: list[EnumDescriptor],
    ) -> None:
        self.name = name
        self.full_name = full_name
        self.fields = sorted(fields, key=lambda f: f.number)
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.oneofs = oneofs
        self.oneofs_by_name = {o.name: o for o in oneofs}
        self.nested_types = nested_types
        self.enum_types = enum_types
        self.containing_type: Descriptor | None = None
        self._concrete_class = None  # set by the builder
        for f in fields:
            f.containing_type = self
            if f.oneof_index is not None and 0 <= f.oneof_index < len(oneofs):
                f.containing_oneof = oneofs[f.oneof_index]
                oneofs[f.oneof_index].fields.append(f)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Descriptor {self.full_name}>"


class FileDescriptor:
    def __init__(
        self,
        name: str,
        package: str,
        message_types: list[Descriptor],
        enum_types: list[EnumDescriptor],
        serialized_pb: bytes,
    ) -> None:
        self.name = name
        self.package = package
        self.message_types_by_name = {m.name: m for m in message_types}
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.serialized_pb = serialized_pb
