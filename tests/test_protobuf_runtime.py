"""The repo's minimal protobuf runtime (google/protobuf/) — wire-format
pinning, independent of Spark. These bytes are the proto3 encoding the
JVM's real protobuf library parses, so every assertion here is a
cross-engine compatibility claim: tag = (field<<3)|wiretype, varints
little-endian base-128, negative int64 as 10-byte two's complement,
oneof presence on the wire even at default values.
"""

from __future__ import annotations

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
import pytest

from google.protobuf import wire


def test_vendored_runtime_is_in_use():
    import google.protobuf as gp

    if "mock-map-reduce-spark-min" not in getattr(gp, "__version__", ""):
        pytest.skip("a real protobuf runtime is installed; vendored one unused")


def test_varint_roundtrip_and_known_bytes():
    out = bytearray()
    wire.encode_varint(300, out)
    assert bytes(out) == b"\xac\x02"  # protobuf.dev encoding-guide example
    assert wire.decode_varint(b"\xac\x02", 0) == (300, 2)
    out = bytearray()
    wire.encode_varint(-2, out)  # two's complement, 10 bytes
    assert len(out) == 10
    v, _ = wire.decode_varint(bytes(out), 0)
    assert wire.to_signed64(v) == -2


def test_known_message_bytes():
    # SetHandleState{state=INITIALIZED} nested through the oneof chain:
    # field 2 (statefulProcessorCall) LEN -> field 1 (setHandleState)
    # LEN -> field 1 (state) VARINT 2
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_oneof_member_at_default_still_on_wire():
    # PRE_INIT = 0: a plain proto3 scalar at 0 would vanish, but inside
    # a message field the empty submessage must still appear (the JVM
    # dispatches on the oneof case).
    req = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.PRE_INIT))
    data = req.SerializeToString()
    assert data == bytes.fromhex("0a00")
    back = sm.StatefulProcessorCall()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "setHandleState"
    assert back.setHandleState.state == sm.PRE_INIT


def test_oneof_switching_clears_sibling():
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert call.WhichOneof("method") == "get"
    call2 = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    assert call2.WhichOneof("method") == "exists"
    # switching in place via constructor-equivalent mutation
    data = call.SerializeToString()
    call3 = sm.ValueStateCall()
    call3.ParseFromString(data)
    assert call3.WhichOneof("method") == "get" and not call3.HasField("exists")


def test_auto_vivified_submessage_joins_parent_on_write():
    cmd = sm.StateCallCommand()
    _ = cmd.ttl  # read alone must NOT create presence
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 77
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 77


def test_repeated_messages_and_bytes_roundtrip():
    resp = sm.StateResponseWithMapIterator(statusCode=0, requireNextFetch=True)
    resp.kvPair.add(key=b"k1", value=b"v1")
    resp.kvPair.add(key=b"k2", value=b"v2")
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]
    assert back.requireNextFetch is True

    lg = sm.StateResponseWithListGet(statusCode=3, errorMessage="boom")
    lg.value.extend([b"a", b"bb", b""])
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(lg.SerializeToString())
    assert list(back2.value) == [b"a", b"bb", b""]
    assert back2.statusCode == 3 and back2.errorMessage == "boom"


def test_negative_int64_roundtrip():
    t = sm.RegisterTimer(expiryTimestampMs=-123456789)
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == -123456789


def test_unknown_fields_are_skipped():
    # field 15 varint + field 14 LEN, unknown to KeyAndValuePair
    extra = bytes.fromhex("780f") + bytes.fromhex("7203616263")
    known = sm.KeyAndValuePair(key=b"k").SerializeToString()
    msg = sm.KeyAndValuePair()
    msg.ParseFromString(known + extra)
    assert msg.key == b"k"


def test_proto3_plain_scalar_default_not_serialized():
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_copyfrom_empty_submessage_establishes_presence():
    # The CopyFrom idiom must put a zero-length submessage on the wire
    # (code-review finding: presence was lost for empty copies).
    cmd = sm.StateCallCommand()
    cmd.ttl.CopyFrom(sm.TTLConfig())
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 0


def test_repeated_insert_and_setitem_reach_the_wire():
    lg = sm.StateResponseWithListGet()
    lg.value.insert(0, b"a")
    lg.value.insert(0, b"z")
    lg.value[1] = b"b"
    back = sm.StateResponseWithListGet()
    back.ParseFromString(lg.SerializeToString())
    assert list(back.value) == [b"z", b"b"]


def test_split_submessage_chunks_merge_not_replace():
    # Wire spec: repeated LEN occurrences of a singular embedded
    # message merge field-by-field.
    chunk1 = sm.StateCallCommand(stateName="s").SerializeToString()
    chunk2 = sm.StateCallCommand(schema="j").SerializeToString()
    out = bytearray()
    from google.protobuf import wire

    # StatefulProcessorCall.getValueState is field 2
    wire.encode_len_delimited(2, chunk1, out)
    wire.encode_len_delimited(2, chunk2, out)
    msg = sm.StatefulProcessorCall()
    msg.ParseFromString(bytes(out))
    assert msg.getValueState.stateName == "s" and msg.getValueState.schema == "j"


def test_truncated_len_field_raises_not_silently_shortens():
    # A LEN field whose declared length runs past the buffer is a
    # corrupted/truncated frame: real protobuf raises DecodeError, so
    # the minimal runtime must raise too — both when the field is
    # known (parsed) and when it is unknown (skipped).
    good = sm.StateCallCommand(stateName="abcdef").SerializeToString()
    with pytest.raises(ValueError, match="truncated"):
        sm.StateCallCommand().ParseFromString(good[:-2])
    # unknown-field skip path: tag for field 1000, LEN, length 100, no payload
    out = bytearray()
    wire.encode_tag(1000, wire.WT_LEN, out)
    wire.encode_varint(100, out)
    with pytest.raises(ValueError, match="truncated"):
        sm.StateCallCommand().ParseFromString(bytes(out))


def test_defers_to_real_protobuf_when_one_is_installed(tmp_path, monkeypatch):
    # Simulate a site-packages protobuf BEHIND the repo root on
    # sys.path (the shadowing scenario from round-9 ADVICE): a fresh
    # import of google.protobuf must resolve to IT, not the vendored
    # minimal runtime.
    import subprocess
    import sys as _sys

    site = tmp_path / "site"
    pkg = site / "google" / "protobuf"
    pkg.mkdir(parents=True)
    (site / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (pkg / "__init__.py").write_text("__version__ = '5.99.0-fake-real'\n")
    (pkg / "json_format.py").write_text("")  # the real-distribution marker
    (pkg / "descriptor.py").write_text("REAL = True\n")
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
        "import google.protobuf as gp\n"
        "from google.protobuf import descriptor\n"
        "assert gp.__version__ == '5.99.0-fake-real', gp.__version__\n"
        "assert descriptor.REAL\n"
        "print('deferred ok')\n"
    ) % (str(site), "/root/repo")
    res = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert res.returncode == 0, res.stderr
    assert "deferred ok" in res.stdout
