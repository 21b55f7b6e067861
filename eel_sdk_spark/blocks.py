"""Encoded-block header pack/unpack.

A block is the engine's unit of encoded data: one column of one Arrow batch
of one Spark partition. Its self-describing header carries the codec id,
json-able codec params, and named binary side-tables (dictionary values,
FSST symbol tables, serialized Arrow schema, null bitmap).

This is the moral equivalent of a parquet page header + footer metadata in
the reference's writer (eel-core/src/main/scala/io/eels/component/parquet/
RowParquetWriterFn.scala:34-52), reified as plain bytes so the whole
pipeline stays a DataFrame of rows.

Layout (little-endian):
    magic   4s   b"EELB"
    version u8   1
    jlen    u32  length of utf-8 json params
    json    jlen bytes
    ntab    u16  number of side tables
    per table: nlen u16, name utf-8, tlen u64, table bytes
"""

from __future__ import annotations

import json
import struct

MAGIC = b"EELB"
VERSION = 1


def pack_header(params: dict, tables: dict[str, bytes] | None = None) -> bytes:
    tables = tables or {}
    j = json.dumps(params, separators=(",", ":")).encode("utf-8")
    out = [MAGIC, struct.pack("<BI", VERSION, len(j)), j, struct.pack("<H", len(tables))]
    for name, data in tables.items():
        nb = name.encode("utf-8")
        out.append(struct.pack("<H", len(nb)))
        out.append(nb)
        out.append(struct.pack("<Q", len(data)))
        out.append(data)
    return b"".join(out)


def unpack_header(buf: bytes) -> tuple[dict, dict[str, bytes]]:
    if buf[:4] != MAGIC:
        raise ValueError("bad block header magic")
    version, jlen = struct.unpack_from("<BI", buf, 4)
    if version != VERSION:
        raise ValueError(f"unsupported block header version {version}")
    off = 9
    params = json.loads(buf[off : off + jlen].decode("utf-8"))
    off += jlen
    (ntab,) = struct.unpack_from("<H", buf, off)
    off += 2
    tables: dict[str, bytes] = {}
    for _ in range(ntab):
        (nlen,) = struct.unpack_from("<H", buf, off)
        off += 2
        name = buf[off : off + nlen].decode("utf-8")
        off += nlen
        (tlen,) = struct.unpack_from("<Q", buf, off)
        off += 8
        tables[name] = bytes(buf[off : off + tlen])
        off += tlen
    return params, tables
