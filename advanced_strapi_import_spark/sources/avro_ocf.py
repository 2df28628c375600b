"""Pure-Python Avro Object Container File (OCF) reader/writer.

The container ships Avro's core jars but NOT the `spark-avro`
datasource module, so `spark.read.format("avro")` fails (verified).
The FORMAT itself needs no library: an OCF is a 4-byte magic, a
file-metadata map carrying the JSON schema and codec, a 16-byte sync
marker, then blocks of (record count, byte size, binary-encoded
records, sync) — with zigzag-varint primitives and zlib ("deflate")
as the only common codec, both stdlib territory. This module
implements the spec subset a tabular engine needs (public spec:
Avro 1.11 Object Container Files + binary encoding):

- schemas: a top-level ``record`` whose fields are primitives
  (null / boolean / int / long / float / double / string / bytes),
  NESTED records, ARRAYS, or the nullable union ``["null", T]`` of any
  of those (round 8 extended the original primitive-only subset —
  nested lake schemas are the first thing a real user ships)
- codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951)

Still-unsupported schema features (maps, enums, fixed, logical types,
general multi-branch unions, recursive/named type references) raise
loudly at planning time naming the field — the documented boundary
where a production deployment adds the spark-avro jar; the DataSource
wrapper (`avro_datasource.py`) keeps the same plan shape either way.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
_PRIMS = {"null", "boolean", "int", "long", "float", "double",
          "string", "bytes"}


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------
def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise ValueError("invalid avro: varint overrun")
        return _zigzag_decode(acc)

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("invalid avro: truncated")
        self.pos += n
        return out


# ---------------------------------------------------------------------------
# recursive schema compiler (round 8: nested records + arrays)
# ---------------------------------------------------------------------------
# node forms:
#   ("prim", type_name)
#   ("null_union", null_branch_index, node)   # ["null", T] either order
#   ("record", [(field_name, node), ...])
#   ("array", item_node)
def compile_type(t, field: str):
    """Avro type -> codec node, or raise naming the offending field."""
    if isinstance(t, list):
        if len(t) != 2 or "null" not in t or t[0] == t[1]:
            raise ValueError(
                f"avro_ocf: field {field!r}: only [null, T] unions are"
                f" supported, got {t}"
            )
        null_idx = t.index("null")
        return ("null_union", null_idx, compile_type(t[1 - null_idx], field))
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "record":
            return (
                "record",
                [
                    (f["name"], compile_type(f["type"], f"{field}.{f['name']}"))
                    for f in t["fields"]
                ],
            )
        if kind == "array":
            return ("array", compile_type(t["items"], f"{field}[]"))
        if kind in _PRIMS:  # {"type": "long"} annotation form
            return ("prim", kind)
        raise ValueError(
            f"avro_ocf: field {field!r} has unsupported type {kind!r}"
            " (subset boundary: primitives, nested records, arrays and"
            " [null, T] unions — add the spark-avro jar for"
            " maps/enums/fixed/logical types)"
        )
    if isinstance(t, str) and t in _PRIMS:
        return ("prim", t)
    raise ValueError(
        f"avro_ocf: field {field!r} has unsupported type {t!r}"
        " (subset boundary: primitives, nested records, arrays and"
        " [null, T] unions — add the spark-avro jar for"
        " maps/enums/fixed/logical types)"
    )


def compile_schema(schema: dict) -> list[tuple[str, tuple]]:
    """Top-level record -> [(field_name, node)] or raise."""
    if schema.get("type") != "record":
        raise ValueError("avro_ocf: top-level schema must be a record")
    return [
        (f["name"], compile_type(f["type"], f["name"]))
        for f in schema["fields"]
    ]


def _encode_node(buf: bytearray, node, v) -> None:
    kind = node[0]
    if kind == "prim":
        _encode_value(buf, node[1], v)
    elif kind == "null_union":
        _, null_idx, inner = node
        if v is None:
            write_long(buf, null_idx)
        else:
            write_long(buf, 1 - null_idx)
            _encode_node(buf, inner, v)
    elif kind == "record":
        # None for a NON-nullable record must fail like a None
        # primitive does (write_long raises), not silently encode
        # children-of-nothing — nullable fields are null_union nodes
        # and never reach here with None
        if v is None:
            raise TypeError(
                "avro_ocf: None for a non-nullable record field"
            )
        for name, child in node[1]:
            item = v.get(name) if isinstance(v, dict) else v[name]
            _encode_node(buf, child, item)
    else:  # array: one block of len(v) items, then the 0 terminator
        if v is None:
            raise TypeError(
                "avro_ocf: None for a non-nullable array field"
            )
        items = list(v)
        if items:
            write_long(buf, len(items))
            for item in items:
                _encode_node(buf, node[1], item)
        write_long(buf, 0)


def _decode_node(r: "_Reader", node):
    kind = node[0]
    if kind == "prim":
        return _decode_value(r, node[1])
    if kind == "null_union":
        _, null_idx, inner = node
        idx = r.long()
        if idx not in (0, 1):
            raise ValueError("invalid avro: union index")
        return None if idx == null_idx else _decode_node(r, inner)
    if kind == "record":
        return {name: _decode_node(r, child) for name, child in node[1]}
    out = []  # array: spec allows many blocks; negative count = sized
    while True:
        n = r.long()
        if n == 0:
            return out
        if n < 0:
            n = -n
            r.long()  # block byte size (used by skippers, not us)
        for _ in range(n):
            out.append(_decode_node(r, node[1]))


def _encode_value(buf: bytearray, t: str, v) -> None:
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if v else 0)
    elif t in ("int", "long"):
        write_long(buf, int(v))
    elif t == "float":
        buf += struct.pack("<f", float(v))
    elif t == "double":
        buf += struct.pack("<d", float(v))
    elif t == "string":
        raw = str(v).encode("utf-8")
        write_long(buf, len(raw))
        buf += raw
    elif t == "bytes":
        raw = bytes(v)
        write_long(buf, len(raw))
        buf += raw
    else:  # pragma: no cover — compile_schema guards
        raise ValueError(f"avro_ocf: unsupported type {t}")


def _decode_value(r: _Reader, t: str):
    if t == "null":
        return None
    if t == "boolean":
        return r.raw(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "string":
        return r.raw(r.long()).decode("utf-8")
    if t == "bytes":
        return bytes(r.raw(r.long()))
    raise ValueError(f"avro_ocf: unsupported type {t}")  # pragma: no cover


# ---------------------------------------------------------------------------
# container read/write
# ---------------------------------------------------------------------------
def write_ocf(
    path: str,
    schema: dict,
    rows: list[dict],
    *,
    codec: str = "deflate",
    block_records: int = 1000,
    sync: bytes | None = None,
) -> None:
    """Write rows (list of dicts; nested records as dicts, arrays as
    lists) as a spec-valid OCF file."""
    fields = compile_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_ocf: unsupported codec {codec}")
    # deterministic sync marker unless provided (content-derived, so
    # identical inputs produce byte-identical files)
    if sync is None:
        import hashlib

        sync = hashlib.md5(
            json.dumps(schema, sort_keys=True).encode() + str(len(rows)).encode()
        ).digest()
    out = bytearray()
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kk = k.encode()
        write_long(out, len(kk))
        out += kk
        write_long(out, len(v))
        out += v
    write_long(out, 0)  # end of metadata map
    out += sync
    for i in range(0, len(rows), block_records):
        chunk = rows[i:i + block_records]
        body = bytearray()
        for row in chunk:
            for name, node in fields:
                _encode_node(body, node, row.get(name))
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC1951 frame
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out += payload
        out += sync
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_ocf_header(data: bytes):
    """-> (schema_dict, codec, sync, first_block_pos)."""
    if data[:4] != MAGIC:
        raise ValueError("invalid avro: bad magic")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count followed by byte size
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode()
            meta[k] = bytes(r.raw(r.long()))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.raw(16)
    return schema, codec, sync, r.pos


def decode_block_rows(payload: bytes, n_rec: int, codec: str, fields):
    """Yield row dicts from one block's (possibly compressed) payload;
    ``fields`` is a :func:`compile_schema` node list."""
    if codec == "deflate":
        payload = zlib.decompress(payload, wbits=-15)
    elif codec != "null":
        raise ValueError(f"avro_ocf: unsupported codec {codec}")
    br = _Reader(payload)
    for _ in range(n_rec):
        yield {name: _decode_node(br, node) for name, node in fields}


def iter_ocf(data: bytes):
    """Yield row dicts from OCF bytes (null/deflate codecs)."""
    schema, codec, sync, pos = read_ocf_header(data)
    fields = compile_schema(schema)
    r = _Reader(data, pos)
    while r.pos < len(data):
        n_rec = r.long()
        size = r.long()
        payload = r.raw(size)
        yield from decode_block_rows(payload, n_rec, codec, fields)
        if r.raw(16) != sync:
            raise ValueError("invalid avro: sync marker mismatch")
