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
  (null / boolean / int / long / float / double / string / bytes)
  or the nullable union ``["null", <primitive>]``
- codecs: ``null`` and ``deflate`` (raw zlib, RFC 1951)

Unsupported schema features (nested records, arrays, maps, enums,
fixed, logical types) raise loudly — the documented boundary where a
production deployment adds the spark-avro jar; the DataSource wrapper
(`avro_datasource.py`) keeps the same plan shape either way.
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
# schema-driven record codec
# ---------------------------------------------------------------------------
def _check_schema(schema: dict) -> list[tuple[str, str, int | None]]:
    """-> [(name, primitive_type, null_branch_index|None)] or raise.

    ``null_branch_index`` preserves the union's DECLARED branch order —
    the wire format writes the branch position, so ["null","long"] and
    ["long","null"] encode the same value differently."""
    if schema.get("type") != "record":
        raise ValueError("avro_ocf: top-level schema must be a record")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        null_idx = None
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t or t[0] == t[1]:
                raise ValueError(
                    f"avro_ocf: only [null, T] unions supported, got {t}"
                )
            null_idx = t.index("null")
            t = t[1 - null_idx]
        if not isinstance(t, str) or t not in _PRIMS:
            raise ValueError(
                f"avro_ocf: unsupported field type {t!r} (subset boundary:"
                " add the spark-avro jar for nested/complex schemas)"
            )
        out.append((f["name"], t, null_idx))
    return out


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
    else:  # pragma: no cover — _check_schema guards
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
    """Write rows (list of dicts) as a spec-valid OCF file."""
    fields = _check_schema(schema)
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
            for name, t, null_idx in fields:
                v = row.get(name)
                if null_idx is not None:
                    if v is None:
                        write_long(body, null_idx)
                        continue
                    write_long(body, 1 - null_idx)
                _encode_value(body, t, v)
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


def iter_ocf(data: bytes):
    """Yield row dicts from OCF bytes (null/deflate codecs)."""
    schema, codec, sync, pos = read_ocf_header(data)
    fields = _check_schema(schema)
    r = _Reader(data, pos)
    while r.pos < len(data):
        n_rec = r.long()
        size = r.long()
        payload = r.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"avro_ocf: unsupported codec {codec}")
        br = _Reader(payload)
        for _ in range(n_rec):
            row = {}
            for name, t, null_idx in fields:
                if null_idx is not None:
                    idx = br.long()
                    if idx not in (0, 1):
                        raise ValueError("invalid avro: union index")
                    if idx == null_idx:
                        row[name] = None
                        continue
                row[name] = _decode_value(br, t)
            yield row
        if r.raw(16) != sync:
            raise ValueError("invalid avro: sync marker mismatch")
