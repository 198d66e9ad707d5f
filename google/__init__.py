# pkgutil-style namespace extension: the repo vendors ONLY
# google/protobuf (a minimal from-scratch runtime — see
# google/protobuf/__init__.py). Without this, having the repo root on
# sys.path would make this regular package shadow every installed
# google.* distribution (google-cloud-*, grpcio-status, ...). With it,
# sibling google.* packages from site-packages keep resolving; the
# protobuf subpackage additionally defers to a real installed protobuf
# at import time (round-9 ADVICE).
__path__ = __import__("pkgutil").extend_path(__path__, __name__)
