"""Builder hooks called by generated pb2 modules.

``BuildMessageAndEnumDescriptors`` drops descriptor objects into the
module globals under the generated naming convention (``_MESSAGENAME``,
nested as ``_OUTER_INNER``); ``BuildTopDescriptorsAndMessages`` creates
the concrete Message classes and module-level enum constants.
"""

from __future__ import annotations

from google.protobuf import message as _message
from google.protobuf import symbol_database as _symbol_database
from google.protobuf.internal.enum_type_wrapper import EnumTypeWrapper


def _walk(messages, prefix=""):  # noqa: ANN001
    for m in messages:
        key = prefix + m.name.upper()
        yield key, m
        yield from _walk(m.nested_types, key + "_")


def BuildMessageAndEnumDescriptors(file_des, module_globals) -> None:  # noqa: ANN001
    for key, m in _walk(file_des.message_types_by_name.values()):
        module_globals["_" + key] = m
        for e in m.enum_types:
            module_globals["_" + key + "_" + e.name.upper()] = e
    for e in file_des.enum_types_by_name.values():
        module_globals["_" + e.name.upper()] = e


def BuildTopDescriptorsAndMessages(file_des, module_name, module_globals) -> None:  # noqa: ANN001
    sym_db = _symbol_database.Default()

    def build_class(desc):  # noqa: ANN001
        attrs = {"DESCRIPTOR": desc, "__module__": module_name}
        for nested in desc.nested_types:
            attrs[nested.name] = build_class(nested)
        cls = type(desc.name, (_message.Message,), attrs)
        desc._concrete_class = cls
        sym_db.RegisterMessage(cls)
        return cls

    for desc in file_des.message_types_by_name.values():
        module_globals[desc.name] = build_class(desc)

    for enum_desc in file_des.enum_types_by_name.values():
        module_globals[enum_desc.name] = EnumTypeWrapper(enum_desc)
        for v in enum_desc.values:
            module_globals[v.name] = v.number
