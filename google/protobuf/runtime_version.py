"""Generated-code runtime-version handshake. This minimal runtime
implements the stable proto3 wire format, which is independent of the
gencode version, so validation is a no-op."""

from __future__ import annotations

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(
    gen_domain: Domain,
    gen_major: int,
    gen_minor: int,
    gen_patch: int,
    gen_suffix: str,
    location: str,
) -> None:
    return None
