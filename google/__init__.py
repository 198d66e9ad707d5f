# Namespace package holding the repo's minimal from-scratch protobuf
# runtime (google/protobuf/). See google/protobuf/__init__.py.
