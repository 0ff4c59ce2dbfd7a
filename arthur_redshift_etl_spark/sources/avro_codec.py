"""Pure-Python Avro Object Container File codec.

Reference parity: the reference ETL accepts AVRO as a per-schema source
format (``config/dw.py:33-50``) and issues ``COPY ... FORMAT AS AVRO``
(``dialect/redshift.py:297-315``).  This environment ships neither the
``spark-avro`` datasource jar nor fastavro, so the binary format is
implemented here directly from the public Apache Avro 1.11 specification
(container file + binary encoding):

- varint/zigzag ints and longs, little-endian IEEE floats/doubles,
  length-prefixed bytes/strings;
- unions as ``long`` branch index + value; arrays/maps as blocked
  sequences (negative block counts with byte-size per the spec are
  handled on read);
- container file: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema`` / ``avro.codec``, 16-byte sync marker, data blocks of
  ``(row_count, byte_size, payload, sync)``;
- codecs: ``null`` and ``deflate`` (raw zlib, spec §"Required Codecs");
- logical types: ``date`` (int days), ``timestamp-micros`` /
  ``local-timestamp-micros`` (long), ``decimal`` (bytes, two's-complement
  big-endian unscaled).

This module is deliberately Spark-free (plain bytes in, Python rows out) so
executors can run it inside ``mapInPandas`` without touching the JVM — see
``sources/avro_io.py`` for the distributed read/write plumbing.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import struct
import zlib
from typing import Any, Dict, Iterable, List, Optional, Tuple, Union

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)

AvroSchema = Union[str, dict, list]


class AvroCodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Binary primitives
# ---------------------------------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise AvroCodecError("truncated Avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        n = 0
        shift = 0
        data = self.data
        pos = self.pos
        while True:
            b = data[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (n >> 1) ^ -(n & 1)  # un-zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


# ---------------------------------------------------------------------------
# Schema-driven encode / decode of single values
# ---------------------------------------------------------------------------


def _schema_type(schema: AvroSchema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode_value(out: bytearray, value: Any, schema: AvroSchema) -> None:
    t = _schema_type(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if (value is None) == (_schema_type(branch) == "null"):
                _write_long(out, i)
                _encode_value(out, value, branch)
                return
        raise AvroCodecError(f"no union branch for {value!r} in {schema}")
    if t == "null":
        return
    if value is None:
        raise AvroCodecError(f"null value for non-nullable {schema}")
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt == "date":
            value = (value - _EPOCH_DATE).days
        elif lt in ("timestamp-micros", "local-timestamp-micros"):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            delta = value - _EPOCH_DT
            value = (delta.days * 86_400_000_000
                     + delta.seconds * 1_000_000 + delta.microseconds)
        elif lt in ("timestamp-millis", "local-timestamp-millis"):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            delta = value - _EPOCH_DT
            value = delta.days * 86_400_000 + delta.seconds * 1000 + delta.microseconds // 1000
        _write_long(out, int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "string":
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        _write_long(out, len(b))
        out += b
    elif t == "bytes":
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt == "decimal":
            unscaled = int(
                decimal.Decimal(value).scaleb(schema["scale"]).to_integral_value(
                    rounding=decimal.ROUND_HALF_UP
                )
            )
            length = max(1, (unscaled.bit_length() + 8) // 8)
            b = unscaled.to_bytes(length, "big", signed=True)
        else:
            b = bytes(value)
        _write_long(out, len(b))
        out += b
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for item in items:
                _encode_value(out, item, schema["items"])
        _write_long(out, 0)
    elif t == "map":
        entries = list(value.items())
        if entries:
            _write_long(out, len(entries))
            for k, v in entries:
                _encode_value(out, k, "string")
                _encode_value(out, v, schema["values"])
        _write_long(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            fv = value.get(f["name"]) if isinstance(value, dict) else getattr(
                value, f["name"]
            )
            _encode_value(out, fv, f["type"])
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise AvroCodecError("fixed size mismatch")
        out += b
    else:
        raise AvroCodecError(f"unsupported Avro type: {t}")


def _decode_value(r: _Reader, schema: AvroSchema) -> Any:
    t = _schema_type(schema)
    if t == "union":
        return _decode_value(r, schema[r.read_long()])
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        n = r.read_long()
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt == "date":
            return _EPOCH_DATE + datetime.timedelta(days=n)
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            return _EPOCH_DT + datetime.timedelta(microseconds=n)
        if lt in ("timestamp-millis", "local-timestamp-millis"):
            return _EPOCH_DT + datetime.timedelta(milliseconds=n)
        return n
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "bytes":
        b = r.read(r.read_long())
        lt = isinstance(schema, dict) and schema.get("logicalType")
        if lt == "decimal":
            unscaled = int.from_bytes(b, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-schema["scale"])
        return b
    if t in ("array", "map"):
        out_list: List[Any] = []
        out_map: Dict[str, Any] = {}
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:  # spec: negative count is followed by block byte size
                count = -count
                r.read_long()
            for _ in range(count):
                if t == "array":
                    out_list.append(_decode_value(r, schema["items"]))
                else:
                    k = r.read(r.read_long()).decode("utf-8")
                    out_map[k] = _decode_value(r, schema["values"])
        return out_list if t == "array" else out_map
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    raise AvroCodecError(f"unsupported Avro type: {t}")


# ---------------------------------------------------------------------------
# Container file
# ---------------------------------------------------------------------------


def write_container(
    fh,
    rows: Iterable[Tuple[Any, ...]],
    schema: dict,
    codec: str = "deflate",
    sync_marker: Optional[bytes] = None,
    block_rows: int = 4096,
) -> int:
    """Write rows (tuples in record-field order) as one Avro OCF stream.

    Returns the number of rows written.  ``schema`` must be a record schema
    (``avro_schema_from_spark`` output).
    """
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported codec: {codec}")
    sync = sync_marker or os.urandom(SYNC_SIZE)
    header = bytearray()
    header += MAGIC
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in sorted(meta.items()):
        _encode_value(header, k, "string")
        _encode_value(header, v, "bytes")
    _write_long(header, 0)
    header += sync
    fh.write(bytes(header))

    fields = [f["type"] for f in schema["fields"]]
    total = 0
    block = bytearray()
    in_block = 0

    def flush() -> None:
        nonlocal block, in_block
        if not in_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate per spec
            payload = c.compress(payload) + c.flush()
        head = bytearray()
        _write_long(head, in_block)
        _write_long(head, len(payload))
        fh.write(bytes(head))
        fh.write(payload)
        fh.write(sync)
        block = bytearray()
        in_block = 0

    for row in rows:
        for value, fschema in zip(row, fields):
            _encode_value(block, value, fschema)
        in_block += 1
        total += 1
        if in_block >= block_rows:
            flush()
    flush()
    return total


def read_header(data: bytes) -> Tuple[dict, str, bytes, int]:
    """Parse an OCF header → (schema, codec, sync_marker, data_offset)."""
    if data[:4] != MAGIC:
        raise AvroCodecError("not an Avro object container file")
    r = _Reader(data, 4)
    meta: Dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            count = -count
            r.read_long()
        for _ in range(count):
            k = r.read(r.read_long()).decode("utf-8")
            meta[k] = r.read(r.read_long())
    sync = r.read(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported codec: {codec}")
    return schema, codec, sync, r.pos


def read_container(data: bytes) -> Tuple[dict, List[Tuple[Any, ...]]]:
    """Decode one OCF byte string → (schema, rows as tuples)."""
    schema, codec, sync, offset = read_header(data)
    fields = [f["type"] for f in schema["fields"]]
    rows: List[Tuple[Any, ...]] = []
    r = _Reader(data, offset)
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        if r.read(SYNC_SIZE) != sync:
            raise AvroCodecError("sync marker mismatch (corrupt block)")
        br = _Reader(payload)
        for _ in range(count):
            rows.append(tuple(_decode_value(br, f) for f in fields))
    return schema, rows


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping (mirrors the public spark-avro conversion)
# ---------------------------------------------------------------------------


def avro_schema_from_spark(struct, name: str = "topLevelRecord") -> dict:
    """Spark StructType → Avro record schema (nullable fields as unions)."""
    from pyspark.sql import types as T

    def convert(dt, field_name: str) -> AvroSchema:
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, T.ArrayType):
            items = convert(dt.elementType, field_name + "_item")
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise AvroCodecError("Avro maps require string keys")
            values = convert(dt.valueType, field_name + "_value")
            if dt.valueContainsNull:
                values = ["null", values]
            return {"type": "map", "values": values}
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": field_name,
                "fields": [
                    {
                        "name": f.name,
                        "type": ["null", convert(f.dataType, field_name + "_" + f.name)]
                        if f.nullable
                        else convert(f.dataType, field_name + "_" + f.name),
                    }
                    for f in dt.fields
                ],
            }
        raise AvroCodecError(f"unsupported Spark type for Avro: {dt}")

    top = convert(struct, name)
    top["name"] = name
    return top


def spark_schema_from_avro(schema: dict):
    """Avro record schema → Spark StructType."""
    from pyspark.sql import types as T

    def nullable_of(s: AvroSchema) -> Tuple[AvroSchema, bool]:
        if isinstance(s, list):
            branches = [b for b in s if _schema_type(b) != "null"]
            if len(branches) != 1:
                raise AvroCodecError(f"unsupported union: {s}")
            return branches[0], True
        return s, False

    def convert(s: AvroSchema):
        t = _schema_type(s)
        lt = isinstance(s, dict) and s.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if lt in ("local-timestamp-micros", "local-timestamp-millis"):
            return T.TimestampNTZType()
        if lt == "decimal":
            return T.DecimalType(s["precision"], s["scale"])
        if t == "boolean":
            return T.BooleanType()
        if t == "int":
            return T.IntegerType()
        if t == "long":
            return T.LongType()
        if t == "float":
            return T.FloatType()
        if t == "double":
            return T.DoubleType()
        if t == "string":
            return T.StringType()
        if t in ("bytes", "fixed"):
            return T.BinaryType()
        if t == "enum":
            return T.StringType()
        if t == "array":
            items, n = nullable_of(s["items"])
            return T.ArrayType(convert(items), containsNull=n)
        if t == "map":
            values, n = nullable_of(s["values"])
            return T.MapType(T.StringType(), convert(values), valueContainsNull=n)
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], convert(nullable_of(f["type"])[0]),
                                  nullable=nullable_of(f["type"])[1])
                    for f in s["fields"]
                ]
            )
        raise AvroCodecError(f"unsupported Avro type: {t}")

    if _schema_type(schema) != "record":
        raise AvroCodecError("top-level Avro schema must be a record")
    return convert(schema)


def write_file(path: str, rows, schema: dict, codec: str = "deflate") -> int:
    with open(path, "wb") as fh:
        return write_container(fh, rows, schema, codec=codec)


def read_file(path: str) -> Tuple[dict, List[Tuple[Any, ...]]]:
    with open(path, "rb") as fh:
        return read_container(fh.read())
