"""Decaton protobuf wire format — engine-native, no protobuf library.

The reference's blessed codec is protobuf
(``protocol/src/main/proto/decaton.proto:9-25`` —
``TaskMetadataProto{1:timestamp_millis, 2:source_application_id,
3:source_instance_id, 4:retry_count, 5:scheduled_time_millis}`` and
``decaton_internal.proto:13-18`` — ``DecatonTaskRequest{1:metadata,
2:serialized_task}``; decoder
``protobuf/.../ProtocolBuffersDeserializer.java``).

This container has no spark-protobuf jar, no ``google.protobuf`` and no
``protoc``, so the wire format is implemented from the public protobuf
encoding spec (https://protobuf.dev/programming-guides/encoding/):

- **Encoder**: cross-engine SQL fragments (varint + length-delimited
  fields, proto3 default-value omission) producing the wire bytes as a
  hex string — pure expressions, whole-stage-codegen'd in Spark and
  replayable verbatim by the DuckDB oracle, so the byte-exact wire
  format is driver-verified. ``F.unhex`` turns it into real bytes for a
  Kafka sink.
- **Decoder**: a dependency-free Python wire-format parser (varint /
  length-delimited walk, unknown fields skipped as the spec requires)
  applied over Arrow batches via ``mapInPandas`` — decode is inherently
  per-record byte walking, the one place Python is the honest tool.

Shared-dialect constraints: ``>> & |`` bit ops, ``hex``/``unhex``,
``lpad``, ``concat`` behave identically in Spark 4 and DuckDB; byte
lengths come from ``length(hex)/2`` (DuckDB's ``octet_length`` is
BLOB-only). Supported range: non-negative int64 (all Decaton metadata
values); negative would need the 10-byte two's-complement form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Cross-engine SQL encoder fragments
# ---------------------------------------------------------------------------

_MAX_VARINT_BYTES = 9  # non-negative int64 => at most ceil(63/7) bytes


def pb_varint_hex(expr: str) -> str:
    """Hex of the protobuf base-128 varint encoding of a non-negative
    BIGINT expression. Byte i carries bits 7i..7i+6, continuation bit
    set while higher bits remain."""
    parts = []
    for i in range(_MAX_VARINT_BYTES):
        lo = f"(({expr}) >> {7 * i}) & 127"
        cont = 128 ** (i + 1)
        byte = f"CASE WHEN ({expr}) >= {cont} THEN ({lo}) | 128 ELSE ({lo}) END"
        hx = f"lpad(lower(hex({byte})), 2, '0')"
        if i == 0:
            parts.append(hx)
        else:
            parts.append(f"CASE WHEN ({expr}) >= {128 ** i} THEN {hx} ELSE '' END")
    return "concat(" + ", ".join(parts) + ")"


def pb_int64_field_hex(field_number: int, expr: str) -> str:
    """``tag varint`` hex for an int64 field; proto3 omits zero."""
    tag = f"{field_number << 3:02x}"  # wire type 0 (varint)
    return (
        f"CASE WHEN ({expr}) != 0 "
        f"THEN concat('{tag}', {pb_varint_hex(expr)}) ELSE '' END"
    )


def pb_string_field_hex(field_number: int, expr: str) -> str:
    """``tag len bytes`` hex for a string/bytes field; omits empty."""
    tag = f"{(field_number << 3) | 2:02x}"  # wire type 2 (len-delimited)
    hx = f"lower(hex({expr}))"
    blen = f"CAST(length({hx}) / 2 AS BIGINT)"
    return (
        f"CASE WHEN length({hx}) > 0 "
        f"THEN concat('{tag}', {pb_varint_hex(blen)}, {hx}) ELSE '' END"
    )


def pb_submessage_field_hex(field_number: int, hex_expr: str) -> str:
    """``tag len bytes`` hex for an embedded message whose wire bytes
    are already available as a hex-string expression. Always emitted
    (proto3 omits only *unset* messages, and Decaton always sets
    metadata — DefaultTaskExtractor requires it)."""
    tag = f"{(field_number << 3) | 2:02x}"
    blen = f"CAST(length({hex_expr}) / 2 AS BIGINT)"
    return f"concat('{tag}', {pb_varint_hex(blen)}, {hex_expr})"


def task_metadata_hex(
    timestamp_millis: str = "meta_timestamp_millis",
    source_application_id: str = "'decaton-spark'",
    source_instance_id: str = "'local'",
    retry_count: str = "meta_retry_count",
    scheduled_time_millis: str = "meta_scheduled_time_millis",
) -> str:
    """Wire hex of ``TaskMetadataProto`` (decaton.proto:9-25) from
    column/literal SQL expressions, fields in ascending field order
    (protobuf serializers' canonical order)."""
    return "concat(" + ", ".join(
        [
            pb_int64_field_hex(1, timestamp_millis),
            pb_string_field_hex(2, source_application_id),
            pb_string_field_hex(3, source_instance_id),
            pb_int64_field_hex(4, retry_count),
            pb_int64_field_hex(5, scheduled_time_millis),
        ]
    ) + ")"


def task_request_hex(metadata_hex_expr: str, serialized_task: str = "value") -> str:
    """Wire hex of ``DecatonTaskRequest`` (decaton_internal.proto:13-18):
    field 1 = metadata submessage, field 2 = opaque task bytes."""
    return (
        "concat("
        + pb_submessage_field_hex(1, metadata_hex_expr)
        + ", "
        + pb_string_field_hex(2, serialized_task)
        + ")"
    )


# ---------------------------------------------------------------------------
# Dependency-free wire-format decoder (the spec's parse loop)
# ---------------------------------------------------------------------------


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """(value, next_pos); raises on truncation or >10 bytes."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("varint too long")
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) walking the buffer;
    skips over types this protocol doesn't use (64/32-bit) per spec."""
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = read_varint(buf, pos)
        elif wtype == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 1:
            val, pos = buf[pos : pos + 8], pos + 8
        elif wtype == 5:
            val, pos = buf[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield field, wtype, val


_META_DEFAULTS = {
    "timestamp_millis": 0,
    "source_application_id": "",
    "source_instance_id": "",
    "retry_count": 0,
    "scheduled_time_millis": 0,
}
_META_FIELDS = {
    1: ("timestamp_millis", int),
    2: ("source_application_id", bytes),
    3: ("source_instance_id", bytes),
    4: ("retry_count", int),
    5: ("scheduled_time_millis", int),
}


def parse_task_metadata(buf: bytes) -> dict:
    """``TaskMetadataProto`` → dict with proto3 defaults for absent
    fields (the round-trip identity the oracle checks)."""
    out = dict(_META_DEFAULTS)
    for field, _wtype, val in parse_fields(buf):
        if field in _META_FIELDS:
            name, kind = _META_FIELDS[field]
            out[name] = val.decode("utf-8") if kind is bytes else val
    return out


def parse_task_request(buf: bytes) -> tuple[dict, bytes]:
    """``DecatonTaskRequest`` → (metadata dict, serialized_task)."""
    meta: dict = dict(_META_DEFAULTS)
    task = b""
    for field, _wtype, val in parse_fields(buf):
        if field == 1:
            meta = parse_task_metadata(val)
        elif field == 2:
            task = val
    return meta, task


def decode_task_requests(df: "DataFrame", wire_col: str = "wire") -> "DataFrame":
    """Arrow-batched decode of a binary ``DecatonTaskRequest`` column:
    appends the five metadata columns + ``serialized_task``. Projection
    only — partitioning is preserved, no shuffle."""
    import pandas as pd  # local import: decode path only
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pb_timestamp_millis", T.LongType()),
            T.StructField("pb_source_application_id", T.StringType()),
            T.StructField("pb_source_instance_id", T.StringType()),
            T.StructField("pb_retry_count", T.LongType()),
            T.StructField("pb_scheduled_time_millis", T.LongType()),
            T.StructField("serialized_task", T.BinaryType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            decoded = [parse_task_request(bytes(b)) for b in pdf[wire_col]]
            pdf = pdf.copy()
            pdf["pb_timestamp_millis"] = [m["timestamp_millis"] for m, _ in decoded]
            pdf["pb_source_application_id"] = [
                m["source_application_id"] for m, _ in decoded
            ]
            pdf["pb_source_instance_id"] = [
                m["source_instance_id"] for m, _ in decoded
            ]
            pdf["pb_retry_count"] = [m["retry_count"] for m, _ in decoded]
            pdf["pb_scheduled_time_millis"] = [
                m["scheduled_time_millis"] for m, _ in decoded
            ]
            pdf["serialized_task"] = [t for _, t in decoded]
            yield pdf

    return df.mapInPandas(batches, schema)
