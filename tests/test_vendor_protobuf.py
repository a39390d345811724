"""Unit tests for the vendored mini-protobuf runtime
(``decaton_spark/_vendor/google/protobuf``) against the REAL generated
module it exists to serve (pyspark's ``StateMessage_pb2``) plus
golden-byte wire-format checks (protobuf.dev/programming-guides/
encoding examples are the spec)."""

from __future__ import annotations

import pytest

from decaton_spark._vendor import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_bytes_oneof_nested_enum():
    """StateRequest{statefulProcessorCall{setHandleState{state=2}}}
    serializes to the canonical bytes: field 2 LEN 4 / field 1 LEN 2 /
    field 1 VARINT 2."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_proto3_default_scalars_omitted():
    # statusCode=0, errorMessage="", value=b"" -> zero bytes on the wire
    assert sm.StateResponse(
        statusCode=0, errorMessage="", value=b""
    ).SerializeToString() == b""
    # explicit non-defaults round-trip
    r = sm.StateResponse(statusCode=2, errorMessage="no value", value=b"\x01")
    back = sm.StateResponse()
    back.ParseFromString(r.SerializeToString())
    assert (back.statusCode, back.errorMessage, back.value) == (
        2, "no value", b"\x01",
    )


def test_negative_int64_ten_byte_varint():
    e = sm.ExpiryTimerRequest(expiryTimestampMs=-1)
    data = e.SerializeToString()
    # field 2, varint of two's-complement -1 = 10 x 0xff..0x01
    assert data == b"\x10" + b"\xff" * 9 + b"\x01"
    back = sm.ExpiryTimerRequest()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_submessage_presence_on_mutation_only():
    """Reading a message field must not set it (spec presence rule);
    mutating through it must — including the auto-vivified chain."""
    cmd = sm.StateCallCommand(stateName="s")
    _ = cmd.ttl.durationMs  # read-only traversal
    assert not cmd.HasField("ttl")
    assert b"ttl" not in cmd.SerializeToString()  # field 4 absent
    cmd.ttl.durationMs = 77
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 77


def test_oneof_last_set_wins():
    call = sm.ValueStateCall(stateName="v", exists=sm.Exists())
    assert call.WhichOneof("method") == "exists"
    # setting another member of the oneof evicts the first
    call.valueStateUpdate = sm.ValueStateUpdate(value=b"z")
    assert call.WhichOneof("method") == "valueStateUpdate"
    back = sm.ValueStateCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "valueStateUpdate"
    assert back.valueStateUpdate.value == b"z"
    assert not back.HasField("exists")


def test_repeated_bytes_and_message_roundtrip():
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=123),
            sm.TimerInfo(timestampMs=456),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in back.timer] == [123, 456]
    assert back.timer[0].key == b"k1"
    assert back.timer[1].key == b""  # proto3 optional, unset -> default
    assert back.requireNextFetch is True

    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    back2 = sm.ListStatePut()
    back2.ParseFromString(put.SerializeToString())
    assert list(back2.value) == [b"a", b"bb", b""]
    assert back2.fetchWithArrow is True


def test_unknown_fields_skipped():
    """Bytes from a NEWER schema (extra field 99) must parse: forward
    compatibility is what keeps the vendored runtime safe against JVM
    protobuf upgrades."""
    base = sm.StateResponse(statusCode=7).SerializeToString()
    # append unknown field 99 (varint) and unknown field 100 (LEN)
    extra = b"\x98\x06\x2a" + b"\xa2\x06\x03abc"
    back = sm.StateResponse()
    back.ParseFromString(base + extra)
    assert back.statusCode == 7


def test_field_order_independent_parse():
    """The JVM may emit fields in any order; value-before-status must
    parse identically."""
    a = sm.StateResponse(statusCode=1, value=b"xy").SerializeToString()
    # hand-build the reversed order: field3 LEN "xy", field1 varint 1
    reordered = b"\x1a\x02xy" + b"\x08\x01"
    m1, m2 = sm.StateResponse(), sm.StateResponse()
    m1.ParseFromString(a)
    m2.ParseFromString(reordered)
    assert (m1.statusCode, m1.value) == (m2.statusCode, m2.value) == (1, b"xy")


def test_descriptor_surface_matches_generated_module():
    d = sm.StateRequest.DESCRIPTOR
    assert d.name == "StateRequest"
    assert set(d.oneofs_by_name) == {"method"}
    assert sm.DESCRIPTOR.message_types_by_name["TimerInfo"].fields_by_name[
        "key"
    ].proto3_optional
    # module-level enum constants (proto3 hoisting)
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("DATA_PROCESSED") == 3
    assert sm.HandleState.Name(4) == "TIMER_PROCESSED"


# -- property sweep: serialize/parse round-trip over generated values ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    _i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    _i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    _blob = st.binary(max_size=64)
    _text = st.text(max_size=48)

    @settings(max_examples=200, deadline=None)
    @given(
        status=_i32,
        err=_text,
        values=st.lists(_blob, max_size=8),
        more=st.booleans(),
    )
    def test_roundtrip_response_with_list(status, err, values, more):
        m = sm.StateResponseWithListGet(
            statusCode=status,
            errorMessage=err,
            value=values,
            requireNextFetch=more,
        )
        back = sm.StateResponseWithListGet()
        back.ParseFromString(m.SerializeToString())
        assert back.statusCode == status
        assert back.errorMessage == err
        assert list(back.value) == values
        assert back.requireNextFetch == more

    @settings(max_examples=200, deadline=None)
    @given(
        timers=st.lists(
            st.tuples(st.one_of(st.none(), _blob), _i64), max_size=6
        ),
        more=st.booleans(),
    )
    def test_roundtrip_timer_response(timers, more):
        m = sm.StateResponseWithTimer(
            timer=[
                sm.TimerInfo(timestampMs=ts)
                if key is None
                else sm.TimerInfo(key=key, timestampMs=ts)
                for key, ts in timers
            ],
            requireNextFetch=more,
        )
        back = sm.StateResponseWithTimer()
        back.ParseFromString(m.SerializeToString())
        assert len(back.timer) == len(timers)
        for t, (key, ts) in zip(back.timer, timers):
            assert t.timestampMs == ts
            assert t.HasField("key") == (key is not None)
            assert t.key == (key if key is not None else b"")
        assert back.requireNextFetch == more

    @settings(max_examples=150, deadline=None)
    @given(name=_text, schema=_text, ttl=st.one_of(st.none(), _i64))
    def test_roundtrip_nested_ttl(name, schema, ttl):
        kwargs = {"stateName": name, "schema": schema}
        if ttl is not None:
            kwargs["ttl"] = sm.TTLConfig(durationMs=ttl)
        m = sm.StateCallCommand(**kwargs)
        back = sm.StateCallCommand()
        back.ParseFromString(m.SerializeToString())
        assert back.stateName == name and back.schema == schema
        assert back.HasField("ttl") == (ttl is not None)
        if ttl is not None:
            assert back.ttl.durationMs == ttl
