"""Minimal proto3 wire-format codec — the ProtobufConverter path.

The reference ships a protobuf converter + reflective serde + proto IDL
(reference ProtobufConverter.kt:62-117, ProtobufSerde.kt:26-73,
src/main/proto/kafka_es/bulk_action.proto:8-23): the action header is a
``kafka_es.BulkAction`` proto message (INDEX/DELETE ops only) and record
values are arbitrary proto messages of a configured class, printed to
JSON with proto field names and proto3 JSON semantics (int64 as string,
optional default-value inclusion — golden ``"counter":"0"`` in
ElasticsearchBulkSenderTests.kt:217).

This is a self-contained wire reader/writer (varint + zigzag + the four
wire types), not a generated binding: the two message shapes involved are
tiny, and a hand decoder avoids depending on protoc at runtime.  Message
types are declared as field tables and registered by full name — the
``protobuf.class`` config analog (reference ProtobufSerde.kt:44-62 loads
the configured class's parser once; here the stage resolves the registered
type once per actor)."""

from __future__ import annotations

import json
import struct

# ---------------------------------------------------------------- wire

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= (1 << 64) - 1  # two's complement 64-bit (proto int32/int64)
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _skip_field(data: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WT_VARINT:
        _, pos = _read_varint(data, pos)
    elif wire_type == _WT_I64:
        pos += 8
    elif wire_type == _WT_LEN:
        n, pos = _read_varint(data, pos)
        pos += n
    elif wire_type == _WT_I32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    if pos > len(data):
        raise ValueError("field overruns buffer")
    return pos


_SIGNED_32 = ("int32", "enum")
_SIGNED_64 = ("int64",)


class ProtoMessageType:
    """A proto3 message shape: field number -> (name, kind).

    kind: int32 | int64 | uint32 | uint64 | bool | enum | string | bytes |
    double | float.  Decoding is proto3-faithful: unknown fields are
    skipped, missing fields default (0 / "" / False), later occurrences of
    a scalar win."""

    def __init__(self, full_name: str, fields: dict[int, tuple[str, str]]):
        self.full_name = full_name
        self.fields = fields
        self.defaults = {
            name: (0.0 if kind in ("double", "float") else False if kind == "bool" else "" if kind == "string" else b"" if kind == "bytes" else 0)
            for name, kind in fields.values()
        }

    def decode(self, data: bytes) -> dict:
        values = dict(self.defaults)
        pos = 0
        while pos < len(data):
            key, pos = _read_varint(data, pos)
            field_num, wire_type = key >> 3, key & 0x7
            spec = self.fields.get(field_num)
            if spec is None:
                pos = _skip_field(data, pos, wire_type)
                continue
            name, kind = spec
            if kind in ("int32", "int64", "uint32", "uint64", "bool", "enum"):
                if wire_type != _WT_VARINT:
                    raise ValueError(f"field {name}: expected varint, got wt={wire_type}")
                v, pos = _read_varint(data, pos)
                if kind in _SIGNED_32 and v >= 1 << 31:
                    v -= 1 << 32 if v < 1 << 32 else 1 << 64
                elif kind in _SIGNED_64 and v >= 1 << 63:
                    v -= 1 << 64
                values[name] = bool(v) if kind == "bool" else v
            elif kind in ("string", "bytes"):
                if wire_type != _WT_LEN:
                    raise ValueError(f"field {name}: expected bytes, got wt={wire_type}")
                n, pos = _read_varint(data, pos)
                if pos + n > len(data):
                    raise ValueError("length-delimited field overruns buffer")
                raw = data[pos : pos + n]
                pos += n
                values[name] = raw.decode("utf-8") if kind == "string" else raw
            elif kind == "double":
                if wire_type != _WT_I64 or pos + 8 > len(data):
                    raise ValueError(f"field {name}: bad double")
                values[name] = struct.unpack_from("<d", data, pos)[0]
                pos += 8
            elif kind == "float":
                if wire_type != _WT_I32 or pos + 4 > len(data):
                    raise ValueError(f"field {name}: bad float")
                values[name] = struct.unpack_from("<f", data, pos)[0]
                pos += 4
            else:
                raise ValueError(f"unsupported kind {kind}")
        return values

    def encode(self, values: dict) -> bytes:
        """proto3 serialization (defaults omitted) — fixture generation
        and the fromConnectData round-trip analog."""
        out = bytearray()
        for field_num in sorted(self.fields):
            name, kind = self.fields[field_num]
            v = values.get(name, self.defaults[name])
            if v == self.defaults[name] and not isinstance(v, float):
                continue
            if kind in ("int32", "int64", "uint32", "uint64", "bool", "enum"):
                _write_varint(out, (field_num << 3) | _WT_VARINT)
                _write_varint(out, int(v))
            elif kind in ("string", "bytes"):
                raw = v.encode("utf-8") if isinstance(v, str) else v
                _write_varint(out, (field_num << 3) | _WT_LEN)
                _write_varint(out, len(raw))
                out += raw
            elif kind == "double":
                if v == 0.0:
                    continue
                _write_varint(out, (field_num << 3) | _WT_I64)
                out += struct.pack("<d", v)
            elif kind == "float":
                if v == 0.0:
                    continue
                _write_varint(out, (field_num << 3) | _WT_I32)
                out += struct.pack("<f", v)
        return bytes(out)

    def to_json(self, values: dict, include_defaults: bool = False) -> str:
        """proto3 JSON printing with PROTO field names, no insignificant
        whitespace, int64/uint64 as strings — the deterministic printer
        invariant (reference BulkAction.kt:277-295, golden
        ElasticsearchBulkSenderTests.kt:215-218)."""
        obj = {}
        for field_num in sorted(self.fields):
            name, kind = self.fields[field_num]
            v = values.get(name, self.defaults[name])
            if not include_defaults and v == self.defaults[name]:
                continue
            if kind in ("int64", "uint64"):
                obj[name] = str(int(v))
            elif kind == "bytes":
                import base64

                obj[name] = base64.b64encode(v).decode("ascii")
            else:
                obj[name] = v
        return json.dumps(obj, separators=(",", ":"))


# ------------------------------------------------------------- messages

# reference src/main/proto/kafka_es/bulk_action.proto:8-23
OP_INDEX, OP_DELETE = 0, 1

BULK_ACTION = ProtoMessageType(
    "kafka_es.BulkAction",
    {
        1: ("op_type", "enum"),
        2: ("index", "string"),
        3: ("type", "string"),
        4: ("id", "string"),
        5: ("routing", "string"),
        6: ("parent", "string"),
    },
)

# reference src/test/proto/es_kafka_evo/test.proto:8-12
TEST_DOCUMENT = ProtoMessageType(
    "evo_kafka_es.TestDocument",
    {1: ("id", "int32"), 2: ("name", "string"), 3: ("counter", "int64")},
)

# the protobuf.class registry — user-extension surface (SURVEY §2.5):
# register a message type once, reference it by full name in the stage
PROTO_REGISTRY: dict[str, ProtoMessageType] = {
    BULK_ACTION.full_name: BULK_ACTION,
    TEST_DOCUMENT.full_name: TEST_DOCUMENT,
}


def register_proto(msg_type: ProtoMessageType) -> None:
    PROTO_REGISTRY[msg_type.full_name] = msg_type


def resolve_proto(full_name: str) -> ProtoMessageType:
    """The configure-time class load (ProtobufSerde.kt:44-62 analog):
    unknown name -> error at configure time, not per record."""
    try:
        return PROTO_REGISTRY[full_name]
    except KeyError:
        raise ValueError(
            f"Class {full_name} could not be found (register it with register_proto)"
        ) from None
