"""pquads — the binary ProtoBuf quad format.

Re-expression of the reference's ``quad/pquads`` package (used by
``cayley convert``, the HTTP client, and KV/log serialization —
reference cmd/cayley/command/database.go:88-168, client/client.go:50-98,
graph/proto/serializations.proto imports ``quads.proto``).

Wire layout implemented here, after the public pquads format:

- file magic ``\\x00pq\\x00`` (4 bytes);
- a stream of uvarint-length-prefixed protobuf ``Quad`` messages;
- ``.gz``-suffixed paths are gzip-compressed.

Protobuf schema (field numbers from the public ``quads.proto`` of the
cayleygraph/quad repository)::

    message Quad {
        string subject = 1;        // raw-string form (strict mode)
        string predicate = 2;
        string object = 3;
        string label = 4;
        Value subject_value = 5;   // typed form (full mode)
        Value predicate_value = 6;
        Value object_value = 7;
        Value label_value = 8;
    }
    message Value {
        oneof value {
            bytes raw = 1; string str = 2; string iri = 3;
            string bnode = 4; TypedString typed_str = 5;
            LangString lang_str = 6; int64 int = 7; double float = 8;
            bool boolean = 9; Time time = 10;   // seconds=1, nanos=2
        }
    }

The writer emits full (typed) quads; the reader accepts both the
typed and the raw-string forms. The protobuf codec is hand-rolled
(~wire-format only: varints, tag bytes, length-delimited fields) —
no protobuf runtime needed, and the per-record codec is small enough
to run inside ``mapPartitions`` for the distributed read path.

The pquads module source is not part of the reference checkout, so
byte-level parity with its optional header/negotiation records is not
guaranteed; the schema above follows the public quads.proto and the
format round-trips through this module losslessly.
"""

from __future__ import annotations

import gzip
import struct
from datetime import datetime, timezone
from io import BytesIO

from pyspark.sql import SparkSession

from .. import values as V
from ..store import GraphStore

MAGIC = b"\x00pq\x00"

# ---------------- varint / wire primitives ----------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _tag(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _tag(field, 2) + _uvarint(len(payload)) + payload


# ---------------- Value codec ----------------


def encode_value(v: V.Value) -> bytes:
    if isinstance(v, V.IRI):
        return _ld(3, v.s.encode())
    if isinstance(v, V.BNode):
        return _ld(4, v.s.encode())
    if isinstance(v, V.String):
        return _ld(2, v.s.encode())
    if isinstance(v, V.TypedString):
        sub = _ld(1, v.s.encode()) + _ld(2, v.datatype.encode())
        return _ld(5, sub)
    if isinstance(v, V.LangString):
        sub = _ld(1, v.s.encode()) + _ld(2, v.lang.encode())
        return _ld(6, sub)
    if isinstance(v, V.Int):
        # int64, wire type 0: uvarint of the 64-bit two's complement
        return _tag(7, 0) + _uvarint(v.v & ((1 << 64) - 1))
    if isinstance(v, V.Float):
        return _tag(8, 1) + struct.pack("<d", v.v)
    if isinstance(v, V.Bool):
        return _tag(9, 0) + _uvarint(1 if v.v else 0)
    if isinstance(v, V.Time):
        dt = v.v
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        # protobuf Timestamp convention: floor seconds, nanos in
        # [0, 1e9). timedelta normalization gives exactly that (days
        # may be negative; seconds/microseconds are non-negative), so
        # pre-1970 fractional times round-trip — int(dt.timestamp())
        # truncates toward zero and was off by 1s for those.
        delta = dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
        secs = delta.days * 86400 + delta.seconds
        nanos = delta.microseconds * 1000
        sub = b""
        if secs:
            sub += _tag(1, 0) + _uvarint(secs & ((1 << 64) - 1))
        if nanos:
            sub += _tag(2, 0) + _uvarint(nanos)
        return _ld(10, sub)
    if isinstance(v, V.Raw):
        return _ld(1, v.s.encode())
    raise TypeError(f"cannot encode {v!r}")


def decode_value(buf: bytes) -> V.Value:
    mv, pos, end = memoryview(buf), 0, len(buf)
    while pos < end:
        key, pos = _read_uvarint(mv, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_uvarint(mv, pos)
            payload = bytes(mv[pos : pos + ln])
            pos += ln
            if field == 1:
                return V.Raw(payload.decode())
            if field == 2:
                return V.String(payload.decode())
            if field == 3:
                return V.IRI(payload.decode())
            if field == 4:
                return V.BNode(payload.decode())
            if field in (5, 6):
                s = t = ""
                imv, ipos = memoryview(payload), 0
                while ipos < len(payload):
                    ikey, ipos = _read_uvarint(imv, ipos)
                    ifield = ikey >> 3
                    iln, ipos = _read_uvarint(imv, ipos)
                    val = bytes(imv[ipos : ipos + iln]).decode()
                    ipos += iln
                    if ifield == 1:
                        s = val
                    else:
                        t = val
                return V.TypedString(s, t) if field == 5 else V.LangString(s, t)
            if field == 10:
                secs = nanos = 0
                imv, ipos = memoryview(payload), 0
                while ipos < len(payload):
                    ikey, ipos = _read_uvarint(imv, ipos)
                    n, ipos = _read_uvarint(imv, ipos)
                    if (ikey >> 3) == 1:
                        secs = n if n < (1 << 63) else n - (1 << 64)
                    else:
                        nanos = n
                return V.Time(
                    datetime.fromtimestamp(secs, tz=timezone.utc).replace(
                        tzinfo=None, microsecond=nanos // 1000
                    )
                )
        elif wire == 0:
            n, pos = _read_uvarint(mv, pos)
            if field == 7:
                return V.Int(n if n < (1 << 63) else n - (1 << 64))
            if field == 9:
                return V.Bool(bool(n))
        elif wire == 1:
            if field == 8:
                x = struct.unpack("<d", mv[pos : pos + 8])[0]
                pos += 8
                return V.Float(x)
            pos += 8
        elif wire == 5:  # unknown fixed32 field: skip
            pos += 4
        else:  # group (3/4) or reserved wire types: cannot be skipped
            raise ValueError(f"unsupported pquads wire type {wire}")
    raise ValueError("empty pquads Value")


# ---------------- Quad codec ----------------


def encode_quad(s: V.Value, p: V.Value, o: V.Value, l: V.Value | None) -> bytes:
    out = _ld(5, encode_value(s)) + _ld(6, encode_value(p)) + _ld(7, encode_value(o))
    if l is not None:
        out += _ld(8, encode_value(l))
    return out


def decode_quad(buf: bytes) -> tuple:
    mv, pos, end = memoryview(buf), 0, len(buf)
    vals: dict[int, V.Value] = {}
    while pos < end:
        key, pos = _read_uvarint(mv, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # unknown varint field: skip
            _, pos = _read_uvarint(mv, pos)
            continue
        if wire == 1:  # unknown fixed64 field: skip
            pos += 8
            continue
        if wire == 5:  # unknown fixed32 field: skip
            pos += 4
            continue
        if wire != 2:  # group/reserved: cannot be skipped safely
            raise ValueError(f"unsupported pquads wire type {wire}")
        ln, pos = _read_uvarint(mv, pos)
        payload = bytes(mv[pos : pos + ln])
        pos += ln
        if field in (1, 2, 3, 4):  # strict raw-string form
            vals[field + 4] = V.parse_term(payload.decode())
        elif field in (5, 6, 7, 8):
            vals[field] = decode_value(payload)
    return (vals.get(5), vals.get(6), vals.get(7), vals.get(8))


# ---------------- file I/O ----------------


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def write_pquads(store: GraphStore, path: str) -> int:
    """Dump the store as a pquads file (driver-side sequential write —
    the format is a single non-splittable stream, like the reference's
    ``cayley dump``). Returns the quad count."""
    from ..values import parse_term

    n = 0
    with _open(path, "wb") as f:
        f.write(MAGIC)
        it = store.resolve(store.quads.toDF("s", "p", "o", "l")).toLocalIterator()
        for r in it:
            s, p, o = (parse_term(r["s"]), parse_term(r["p"]), parse_term(r["o"]))
            l = parse_term(r["l"]) if r["l"] is not None else None
            rec = encode_quad(s, p, o, l)
            f.write(_uvarint(len(rec)))
            f.write(rec)
            n += 1
    return n


def parse_pquads_bytes(data: bytes) -> list[tuple]:
    """Decode one pquads stream → list of (s, p, o, l) Value tuples."""
    if data[:4] == MAGIC:
        data = data[4:]
    if data[:2] == b"\x1f\x8b":  # gzip inside (e.g. binaryFiles on .gz)
        data = gzip.decompress(data)
        if data[:4] == MAGIC:
            data = data[4:]
    mv, pos, end = memoryview(data), 0, len(data)
    out = []
    while pos < end:
        ln, pos = _read_uvarint(mv, pos)
        out.append(decode_quad(bytes(mv[pos : pos + ln])))
        pos += ln
    return out


def read_pquads(spark: SparkSession, path: str) -> GraphStore:
    """Load a pquads file or directory of files. Each file is one
    sequential stream, so parallelism is per-file (``binaryFiles``):
    a directory of shard files reads fully distributed; a single file
    is one task — same trade-off as any non-splittable format."""
    rdd = spark.sparkContext.binaryFiles(path)

    def to_terms(kv):
        _, data = kv
        for s, p, o, l in parse_pquads_bytes(bytes(data)):
            yield (s.term(), p.term(), o.term(), l.term() if l else None)

    terms = rdd.flatMap(to_terms)
    df = spark.createDataFrame(terms, "st string, pt string, ot string, lt string")
    return GraphStore.from_term_quads(df)
