"""Minimal pure-Python protobuf runtime — written from scratch for this
repo so PySpark's ``transformWithStateInPandas`` state protocol
(pyspark/sql/streaming/proto/StateMessage_pb2.py) can run in an
environment without the ``protobuf`` package.

Scope: exactly the generated-code API surface that pb2 module uses —
``descriptor_pool.Default().AddSerializedFile`` (parses the serialized
FileDescriptorProto embedded in generated code), ``internal.builder``
(materializes descriptors and message classes into the module), and a
dynamic ``Message`` implementation of the proto3 WIRE FORMAT
(SerializeToString / ParseFromString, oneofs, repeated fields, nested
messages, enums). The wire format and descriptor.proto schema are
public, documented at protobuf.dev (encoding guide) and in
google/protobuf/descriptor.proto; nothing here is copied from the
protobuf library.

Deliberately NOT implemented: extensions, groups, maps-as-fields,
unknown-field retention, JSON/Text formats, services — the
StateMessage protocol uses none of them.
"""

__version__ = "0.0.1-mock-map-reduce-spark-min"
