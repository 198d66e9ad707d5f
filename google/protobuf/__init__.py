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

DEFERENCE (round-9 ADVICE): because the repo root usually precedes
site-packages on sys.path, this package would otherwise shadow a real
installed protobuf and silently downgrade consumers that need the
full library (maps, json_format, well-known types). So at import time
it scans the REST of sys.path for a real protobuf distribution
(marker: a ``json_format.py`` next to its ``__init__.py`` — present
in every real release, deliberately absent here) and, if found, hands
this module over to it: ``__path__`` is repointed at the real
directory (so every ``google.protobuf.*`` submodule import resolves
there) and the real ``__init__`` is executed into this namespace (so
``__version__`` etc. are the real ones). The minimal runtime is then
completely inert for that process.
"""


def _installed_protobuf_dir() -> str | None:
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    for entry in sys.path:
        base = os.path.abspath(entry) if entry else os.getcwd()
        cand = os.path.join(base, "google", "protobuf")
        try:
            if os.path.samefile(cand, here):
                continue
        except OSError:
            pass
        if os.path.isfile(os.path.join(cand, "__init__.py")) and os.path.isfile(
            os.path.join(cand, "json_format.py")
        ):
            return cand
    return None


_real = _installed_protobuf_dir()
if _real is not None:
    import os as _os

    __path__ = [_real]  # submodules (descriptor, json_format, ...) -> real pkg
    with open(_os.path.join(_real, "__init__.py"), "rb") as _f:
        exec(  # noqa: S102 — executing the found distribution's own __init__
            compile(_f.read(), _os.path.join(_real, "__init__.py"), "exec"),
            globals(),
        )
else:
    __version__ = "0.0.1-mock-map-reduce-spark-min"
