"""Descriptor pool: parses the serialized FileDescriptorProto embedded
in generated pb2 modules into the descriptor model.

descriptor.proto's field numbers are public and stable (it is the
protobuf schema of protobuf schemas); only the subset generated code
for a plain proto3 file can contain is decoded here:

  FileDescriptorProto: name=1, package=2, message_type=4 (Descriptor-
  Proto), enum_type=5 (EnumDescriptorProto), syntax=12
  DescriptorProto: name=1, field=2 (FieldDescriptorProto),
  nested_type=3, enum_type=4, oneof_decl=8 (OneofDescriptorProto)
  FieldDescriptorProto: name=1, number=3, label=4, type=5,
  type_name=6, oneof_index=9, json_name=10, proto3_optional=17
  OneofDescriptorProto: name=1
  EnumDescriptorProto: name=1, value=2 (EnumValueDescriptorProto:
  name=1, number=2)
"""

from __future__ import annotations

from google.protobuf import wire
from google.protobuf.descriptor import (
    Descriptor,
    EnumDescriptor,
    EnumValueDescriptor,
    FieldDescriptor,
    FileDescriptor,
    OneofDescriptor,
)


def _fields_of(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes;
    value is the raw varint / fixed int / LEN payload bytes."""
    pos = 0
    while pos < len(buf):
        tag, pos = wire.decode_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == wire.WT_VARINT:
            v, pos = wire.decode_varint(buf, pos)
        elif wt == wire.WT_LEN:
            n, pos = wire.decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated message: LEN field overruns buffer")
            v, pos = buf[pos : pos + n], pos + n
        elif wt == wire.WT_I64:
            v, pos = wire.read_fixed64(buf, pos)
        elif wt == wire.WT_I32:
            v, pos = wire.read_fixed32(buf, pos)
        else:
            raise ValueError(f"unsupported wire type {wt} in descriptor")
        yield fnum, wt, v


def _parse_enum(buf: bytes, scope: str) -> EnumDescriptor:
    name = ""
    values: list[EnumValueDescriptor] = []
    for fnum, _wt, v in _fields_of(buf):
        if fnum == 1:
            name = v.decode()
        elif fnum == 2:
            vname, vnum = "", 0
            for f2, _w2, v2 in _fields_of(v):
                if f2 == 1:
                    vname = v2.decode()
                elif f2 == 2:
                    vnum = wire.to_signed64(v2)
            values.append(EnumValueDescriptor(vname, vnum))
    return EnumDescriptor(name, f"{scope}.{name}" if scope else name, values)


def _parse_field(buf: bytes) -> FieldDescriptor:
    name, number, label, ftype, type_name = "", 0, 1, 0, ""
    oneof_index: int | None = None
    proto3_optional = False
    for fnum, _wt, v in _fields_of(buf):
        if fnum == 1:
            name = v.decode()
        elif fnum == 3:
            number = wire.to_signed64(v)
        elif fnum == 4:
            label = wire.to_signed64(v)
        elif fnum == 5:
            ftype = wire.to_signed64(v)
        elif fnum == 6:
            type_name = v.decode()
        elif fnum == 9:
            oneof_index = wire.to_signed64(v)
        elif fnum == 17:
            proto3_optional = bool(v)
    return FieldDescriptor(
        name, number, ftype, label, type_name, oneof_index, proto3_optional
    )


def _parse_message(buf: bytes, scope: str) -> Descriptor:
    name = ""
    fields: list[FieldDescriptor] = []
    nested: list[Descriptor] = []
    enums: list[EnumDescriptor] = []
    oneof_names: list[str] = []
    # two passes: name first so nested scopes are right
    for fnum, _wt, v in _fields_of(buf):
        if fnum == 1:
            name = v.decode()
    full = f"{scope}.{name}" if scope else name
    for fnum, _wt, v in _fields_of(buf):
        if fnum == 2:
            fields.append(_parse_field(v))
        elif fnum == 3:
            nested.append(_parse_message(v, full))
        elif fnum == 4:
            enums.append(_parse_enum(v, full))
        elif fnum == 8:
            oname = ""
            for f2, _w2, v2 in _fields_of(v):
                if f2 == 1:
                    oname = v2.decode()
            oneof_names.append(oname)
    oneofs = [OneofDescriptor(n) for n in oneof_names]
    return Descriptor(name, full, fields, oneofs, nested, enums)


def _all_messages(msgs: list[Descriptor]):
    for m in msgs:
        yield m
        yield from _all_messages(m.nested_types)


class DescriptorPool:
    def __init__(self) -> None:
        self._files: dict[str, FileDescriptor] = {}
        self._messages: dict[str, Descriptor] = {}
        self._enums: dict[str, EnumDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        fname, package = "", ""
        message_bufs: list[bytes] = []
        enum_bufs: list[bytes] = []
        for fnum, _wt, v in _fields_of(serialized):
            if fnum == 1:
                fname = v.decode()
            elif fnum == 2:
                package = v.decode()
            elif fnum == 4:
                message_bufs.append(v)
            elif fnum == 5:
                enum_bufs.append(v)
        messages = [_parse_message(b, package) for b in message_bufs]
        enums = [_parse_enum(b, package) for b in enum_bufs]

        for m in _all_messages(messages):
            self._messages[m.full_name] = m
        for e in enums:
            self._enums[e.full_name] = e
        for m in _all_messages(messages):
            for ne in m.enum_types:
                self._enums[ne.full_name] = ne

        # link field type references (".pkg.Message" leading-dot form)
        for m in _all_messages(messages):
            for f in m.fields:
                if f.type_name:
                    ref = f.type_name.lstrip(".")
                    if ref in self._messages:
                        f.message_type = self._messages[ref]
                    elif ref in self._enums:
                        f.enum_type = self._enums[ref]
                    else:
                        raise KeyError(f"unresolved type reference {f.type_name!r}")

        fd = FileDescriptor(fname, package, messages, enums, serialized)
        self._files[fname] = fd
        return fd

    def FindMessageTypeByName(self, full_name: str) -> Descriptor:
        return self._messages[full_name]


_default_pool = DescriptorPool()


def Default() -> DescriptorPool:
    return _default_pool
