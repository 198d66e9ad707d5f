"""Proto3 wire-format primitives (protobuf.dev encoding guide).

Wire types: 0 VARINT, 1 I64, 2 LEN, 5 I32. Varints are little-endian
base-128 with MSB continuation; negative int32/int64 values are
encoded as the 64-bit two's complement (always 10 bytes).
"""

from __future__ import annotations

import struct

WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5

_MASK64 = (1 << 64) - 1


def encode_varint(value: int, out: bytearray) -> None:
    v = value & _MASK64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, new_pos); value is the raw unsigned 64-bit quantity."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def to_signed64(v: int) -> int:
    """Interpret a raw varint as two's-complement int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


def to_signed32(v: int) -> int:
    """Interpret a raw varint as int32 (encoded as sign-extended 64-bit)."""
    v = to_signed64(v)
    return v  # already the signed value; int32 range enforced by producer


def zigzag_encode(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _MASK64


def zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_tag(field_number: int, wire_type: int, out: bytearray) -> None:
    encode_varint((field_number << 3) | wire_type, out)


def encode_len_delimited(field_number: int, payload: bytes, out: bytearray) -> None:
    encode_tag(field_number, WT_LEN, out)
    encode_varint(len(payload), out)
    out += payload


def skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == WT_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == WT_I64:
        return pos + 8
    if wire_type == WT_LEN:
        n, pos = decode_varint(buf, pos)
        if pos + n > len(buf):
            raise ValueError("truncated message: skipped LEN field overruns buffer")
        return pos + n
    if wire_type == WT_I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


def read_double(buf: bytes, pos: int) -> tuple[float, int]:
    return struct.unpack_from("<d", buf, pos)[0], pos + 8


def read_float(buf: bytes, pos: int) -> tuple[float, int]:
    return struct.unpack_from("<f", buf, pos)[0], pos + 4


def read_fixed64(buf: bytes, pos: int) -> tuple[int, int]:
    return struct.unpack_from("<Q", buf, pos)[0], pos + 8


def read_fixed32(buf: bytes, pos: int) -> tuple[int, int]:
    return struct.unpack_from("<I", buf, pos)[0], pos + 4
