"""WARC / WET readers — the Common-Crawl-shaped ingestion entry
point of a web-corpus training-data pipeline (repo extension; the
reference has no crawl surface — its sources stop at quad formats).

Two readers with complementary guarantees:

- :func:`read_wet` — the SCAN-SPEED path for WET text extracts
  (``WARC-Type: conversion`` records, the format training pipelines
  actually consume). One distributed ``spark.read.text`` with the
  record terminator as a custom line separator, then pure column
  expressions (whole-stage codegen) for header fields and payload —
  no Python in the hot path, and uncompressed files SPLIT across
  executors (Hadoop's text reader handles multi-byte custom
  delimiters across split boundaries). Framing caveats: records are
  delimited by the ``\\r\\n\\r\\nWARC/1.0\\r\\n`` terminator
  sequence, so a payload that itself contains that exact byte
  sequence would mis-split; WET text extracts do not contain WARC
  headers by construction, and the exact reader below exists for
  adversarial inputs. A file framed by any OTHER WARC version
  (e.g. WARC/1.1) would never split — instead of silently yielding
  zero rows, an in-plan guard detects the unconsumed version-line
  boundary and fails the job loudly (use :func:`read_warc` there).
  Trailing payload newlines are trimmed with the record terminator
  (text-extract semantics).

- :func:`read_warc` — the EXACT path for full WARC files: payloads
  are recovered byte-precise by ``Content-Length`` framing per the
  WARC/1.0 spec (ISO 28500), so arbitrary binary payloads —
  including ones embedding ``WARC/1.0`` — are safe. Implemented as
  an Arrow kernel over whole files (``binaryFile`` listing →
  ``mapInPandas``): parallelism is per-file, which matches the
  corpus shape (a Common Crawl snapshot ships ~90k ~1 GB segment
  files — files ARE the distribution unit), and gzip members are
  decompressed with a concatenated-member-safe zlib loop (WARC.gz
  files are per-record gzip members; plain whole-file gzip also
  works).

Both accept globs and directories like any Spark path. Compressed
(.gz) inputs: ``read_wet`` relies on Hadoop's gzip codec (one
partition per file — the standard Common Crawl unit of parallelism);
``read_warc`` decompresses inside the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: WARC/1.0: every record is terminated by CRLF CRLF; the next
#: record opens with the version line. Splitting on the full
#: terminator+version sequence keeps header blocks intact.
_RECORD_SEP = "\r\n\r\nWARC/1.0\r\n"

_WET_SCHEMA = (
    "url string, warc_date string, record_id string, "
    "content_length int, text string"
)


def _header(block, name):
    """Extract one WARC header value from the header block
    (case-INSENSITIVE: ISO 28500 field names are case-insensitive,
    and a legal non-canonical 'warc-target-uri:' must not silently
    yield an empty url — read_warc's dict parse already lowercases;
    tolerant of missing headers -> empty string)."""
    return F.regexp_extract(block, rf"(?mi)^{name}:\s*(\S[^\r\n]*)", 1)


def parse_wet(raw: DataFrame) -> DataFrame:
    """Column-expression WET parse over a frame of records read with
    ``lineSep=_RECORD_SEP`` (one ``value`` column). Pure expressions
    only, so it applies unchanged to BATCH and STREAMING text reads
    (:func:`read_wet` / :func:`read_wet_stream`)."""
    # VERSION GUARD (loud, in-plan): the lineSep framing splits ONLY
    # on the WARC/1.0 terminator sequence. A file using any other
    # version (e.g. WARC/1.1) never splits — it arrives as one giant
    # record whose leading warcinfo block gets filtered, silently
    # yielding ZERO rows: exactly the silent-truncation failure mode
    # this module bans. Detect it precisely: after splitting, no
    # record may still contain a full record-boundary sequence
    # (blank line + a version line) for ANY version — 1.0 occurrences
    # were all consumed by the separator, so a survivor means a
    # missed boundary — and the file-opening version line (the one
    # position the separator never touches) must be exactly 1.0.
    bad = F.col("value").rlike(r"\r\n\r\nWARC/\d+\.\d+\r\n") | F.col(
        "value"
    ).rlike(r"\A(\r\n)?WARC/(?!1\.0\r\n)")
    guard = F.assert_true(
        ~bad,
        F.lit(
            "parse_wet: input is not WARC/1.0-framed (a record still "
            "contains a WARC/x.y boundary the line separator did not "
            "consume) — use read_warc for exact Content-Length parsing"
        ),
    )
    # the first record of each file keeps its opening version line
    # (the separator is the terminator+NEXT version line, so only
    # element 0 starts with one) — strip it unconditionally, then
    # split header block from payload at the first blank line
    rec = F.when(
        guard.isNull(),
        F.regexp_replace(F.col("value"), r"\A(?:\r\n)?WARC/1\.0\r\n", ""),
    )
    hdr = F.substring_index(F.col("r"), "\r\n\r\n", 1)
    # payload = everything after the first CRLFCRLF; the LAST record
    # of a file retains the file-final record terminator — trim
    # trailing CR/LF (text-extract semantics, see module caveat)
    body = F.col("r").substr(
        F.length(hdr) + F.lit(5), F.length(F.col("r"))
    )
    out = (
        raw.where(F.length("value") > 0)
        .select(rec.alias("r"))
        .select(hdr.alias("h"), body.alias("b"))
        .select(
            _header(F.col("h"), "WARC-Type").alias("warc_type"),
            _header(F.col("h"), "WARC-Target-URI").alias("url"),
            _header(F.col("h"), "WARC-Date").alias("warc_date"),
            _header(F.col("h"), "WARC-Record-ID").alias("record_id"),
            _header(F.col("h"), "Content-Length")
            .cast("int")
            .alias("content_length"),
            F.regexp_replace(F.col("b"), r"[\r\n]+\Z", "").alias("text"),
        )
    )
    return out.where(F.col("warc_type") == "conversion").drop("warc_type")


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET text-extract records as
    (url, warc_date, record_id, content_length, text).

    Only ``WARC-Type: conversion`` records are returned (the
    ``warcinfo`` file header record is filtered out). The whole
    parse is column expressions over one text scan — no UDFs."""
    return parse_wet(spark.read.text(path, lineSep=_RECORD_SEP))


def read_wet_stream(
    spark: SparkSession, path: str, **options
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_wet`: watch a
    directory for arriving WET segment files (the crawl-delivery
    pattern) and emit parsed conversion records per micro-batch —
    the same pure-expression parse, so batch and stream results are
    identical for identical files. Extra ``options`` reach the file
    source (e.g. ``maxFilesPerTrigger=1`` for one segment per
    micro-batch — the natural unit for per-batch admission)."""
    reader = spark.readStream
    for k, v in options.items():
        reader = reader.option(k, v)
    return parse_wet(reader.text(path, lineSep=_RECORD_SEP))


def wet_to_documents(wet: DataFrame, keep: tuple = ()) -> DataFrame:
    """Map WET records onto the repo's documents-table contract
    (doc_id, source, text): doc_id is a content-addressed xxhash64 of
    (record id, url) — stable across re-reads and engines — and
    source is the registered host (the per-source unit mixture /
    overlap operators key on). ``keep`` appends passthrough columns
    from the WET frame (e.g. ``("url", "record_id")``) after the
    contract columns — the export_shards ``keep`` convention."""
    # (?i): RFC 3986 schemes are case-insensitive — real crawls carry
    # 'HTTPS://...' URIs, which must not collapse into 'unknown'.
    # Authority userinfo is stripped: the greedy optional
    # ``[^/?#]*@`` consumes everything through the LAST '@' of the
    # authority, so 'https://user@host/' and 'https://u:p@host:8080/'
    # both attribute source 'host' — not 'user@host' or 'u'.
    host = F.regexp_extract(
        "url", r"(?i)^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)", 1
    )
    return wet.select(
        F.xxhash64(
            F.concat_ws("|", F.col("record_id"), F.col("url"))
        ).alias("doc_id"),
        F.coalesce(
            F.nullif(F.lower(host), F.lit("")), F.lit("unknown")
        ).alias("source"),
        "text",
        *keep,
    )


_WARC_SCHEMA = (
    "path string, record_type string, url string, warc_date string, "
    "record_id string, content_type string, content_length long, "
    "payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC.gz layout:
    one member per record) — also handles whole-file gzip and
    passes uncompressed bytes through."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    import zlib

    out = []
    while data.startswith(b"\x1f\x8b"):
        # the startswith guard also tolerates trailing garbage or
        # padding after the final member (seen in the wild) instead
        # of crashing the whole multi-file read with a zlib error
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        data = d.unused_data
        if not d.eof:  # truncated member: surface what decoded —
            break  # the record parser will flag the cut-off record
    return b"".join(out)


def _parse_warc_bytes(path: str, blob: bytes):
    """Exact WARC record iterator: Content-Length framing per the
    spec — payload bytes are never pattern-matched. Malformed input
    RAISES (with file + byte offset) instead of silently dropping
    the rest of the file: a bare stop here would be the
    silent-truncation failure mode the streaming folds ban — one
    corrupt record mid-segment must not make thousands of later
    records vanish without a signal."""
    data = _gunzip_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break

        def _bad(why: str):
            return ValueError(
                f"malformed WARC record in {path} at byte {pos}: {why}"
            )

        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise _bad("header block has no terminating blank line")
        block = data[pos:hdr_end].decode("utf-8", errors="replace")
        if not block.startswith("WARC/"):
            raise _bad(
                f"expected a WARC/ version line, got {block[:30]!r}"
            )
        fields = {}
        for line in block.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            raise _bad(
                "missing or non-integer Content-Length "
                f"({fields.get('content-length', '<absent>')!r})"
            ) from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise _bad(
                f"payload truncated: Content-Length {length} runs "
                f"past end of data ({n - body_start} bytes left)"
            )
        payload = data[body_start : body_start + length]
        yield {
            "path": path,
            "record_type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "record_id": fields.get("warc-record-id", ""),
            "content_type": fields.get("content-type", ""),
            "content_length": length,
            "payload": payload,
        }
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read full WARC files (any record type, binary-safe payloads)
    as ``_WARC_SCHEMA`` rows. Per-file Arrow kernel over a
    ``binaryFile`` listing; records of one file stream through
    pandas batches. Use :func:`read_wet` for WET text extracts —
    it is splittable and UDF-free."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_warc_bytes(p, bytes(blob)))
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, _WARC_SCHEMA)
