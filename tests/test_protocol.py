"""Protobuf wire format (decaton.proto / decaton_internal.proto shapes)
without any protobuf library: the SQL encoder fragments and the Python
parser are checked against hand-computed bytes from the public encoding
spec (https://protobuf.dev/programming-guides/encoding/), then against
each other (round-trip), in both engines.
"""

from __future__ import annotations

import pytest

from decaton_spark import protocol as pb

# (value, wire hex) — spec examples + boundary values
VARINTS = [
    (0, "00"),
    (1, "01"),
    (127, "7f"),
    (128, "8001"),
    (150, "9601"),  # the protobuf docs' canonical example
    (300, "ac02"),
    (16384, "808001"),
    (1_704_412_800_000, None),  # ms timestamp: checked via round-trip
    ((1 << 63) - 1, None),  # int64 max
]


def py_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@pytest.mark.parametrize("value,expected", VARINTS)
def test_varint_hex_both_engines(spark, duck, value, expected):
    frag = pb.pb_varint_hex(f"CAST({value} AS BIGINT)")
    got_spark = spark.sql(f"SELECT {frag} AS h").collect()[0]["h"]
    got_duck = duck.sql(f"SELECT {frag} AS h").fetchone()[0]
    want = expected if expected is not None else py_varint(value).hex()
    assert got_spark == want, f"spark varint({value})"
    assert got_duck == want, f"duckdb varint({value})"
    # parser inverts the encoder
    assert pb.read_varint(bytes.fromhex(want), 0) == (value, len(want) // 2)


def test_metadata_wire_bytes_match_spec(spark, duck):
    """TaskMetadataProto(timestamp_millis=150, source_application_id=
    'app') per spec: field1 tag 0x08 + varint, field2 tag 0x12 + len +
    UTF-8; zero/empty fields omitted (proto3)."""
    frag = pb.task_metadata_hex(
        timestamp_millis="CAST(150 AS BIGINT)",
        source_application_id="'app'",
        source_instance_id="''",
        retry_count="CAST(0 AS BIGINT)",
        scheduled_time_millis="CAST(0 AS BIGINT)",
    )
    want = "089601" + "1203" + b"app".hex()
    assert spark.sql(f"SELECT {frag} AS h").collect()[0]["h"] == want
    assert duck.sql(f"SELECT {frag} AS h").fetchone()[0] == want
    meta = pb.parse_task_metadata(bytes.fromhex(want))
    assert meta == {
        "timestamp_millis": 150,
        "source_application_id": "app",
        "source_instance_id": "",
        "retry_count": 0,
        "scheduled_time_millis": 0,
    }


def test_task_request_round_trip(spark):
    """DecatonTaskRequest: metadata submessage + serialized task bytes,
    encoded by the SQL fragments, decoded by the Python parser."""
    meta = pb.task_metadata_hex(
        timestamp_millis="CAST(1704412800000 AS BIGINT)",
        source_application_id="'svc'",
        source_instance_id="'i-3'",
        retry_count="CAST(7 AS BIGINT)",
        scheduled_time_millis="CAST(1704412860000 AS BIGINT)",
    )
    frag = pb.task_request_hex(meta, "'{\"k\": 1}'")
    hx = spark.sql(f"SELECT {frag} AS h").collect()[0]["h"]
    got_meta, task = pb.parse_task_request(bytes.fromhex(hx))
    assert got_meta == {
        "timestamp_millis": 1704412800000,
        "source_application_id": "svc",
        "source_instance_id": "i-3",
        "retry_count": 7,
        "scheduled_time_millis": 1704412860000,
    }
    assert task == b'{"k": 1}'


def test_parser_skips_unknown_fields():
    """Forward compatibility: unknown field numbers are skipped, known
    ones still decode (spec's unknown-field rule)."""
    # field 9 varint 5, then field 1 varint 150
    buf = bytes.fromhex("4805" + "089601")
    assert pb.parse_task_metadata(buf)["timestamp_millis"] == 150


def test_parser_rejects_truncation():
    with pytest.raises(ValueError):
        pb.read_varint(bytes.fromhex("80"), 0)  # continuation, no next byte
    with pytest.raises(ValueError):
        pb.parse_task_metadata(bytes.fromhex("1205" + "6161"))  # len 5, 2 bytes
