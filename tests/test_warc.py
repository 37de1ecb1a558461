"""WARC / WET reader tests: framing, field extraction, gzip, the
documents-contract mapping, and the exact reader's binary safety
(payloads embedding the record delimiter survive byte-precise)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from cayley_spark.sources.warc import (
    read_warc,
    read_wet,
    wet_to_documents,
)


def _wet_record(rtype, url, text, rid):
    body = text.encode("utf-8")
    hdrs = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
    ]
    if url:
        hdrs.append(f"WARC-Target-URI: {url}")
    hdrs += [
        "WARC-Date: 2026-01-05T10:00:00Z",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"Content-Length: {len(body)}",
    ]
    return "\r\n".join(hdrs).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"


def _wet_file(tmp_path, name, texts, gz=False):
    blob = _wet_record("warcinfo", None, "software: synthetic-test", "info")
    for i, (url, text) in enumerate(texts):
        blob += _wet_record("conversion", url, text, f"rec-{i}")
    p = tmp_path / name
    p.write_bytes(gzip.compress(blob) if gz else blob)
    return str(p)


def test_read_wet_fields_and_payloads(spark, tmp_path):
    texts = [
        ("https://example.com/a", "First page text.\nSecond line."),
        ("http://HÖst.example.org/päge", "Ünïcode payload — naïve café."),
        ("https://example.com/c", "Tail page."),
    ]
    path = _wet_file(tmp_path, "seg.warc.wet", texts)
    got = read_wet(spark, path).orderBy("record_id").collect()
    assert len(got) == 3  # warcinfo filtered
    assert [r["url"] for r in got] == [u for u, _ in texts]
    assert [r["text"] for r in got] == [t for _, t in texts]
    assert all(r["warc_date"] == "2026-01-05T10:00:00Z" for r in got)
    assert got[1]["content_length"] == len(texts[1][1].encode())
    assert got[0]["record_id"] == "<urn:uuid:rec-0>"


def test_read_wet_gzip_and_multifile(spark, tmp_path):
    _wet_file(tmp_path, "a.warc.wet.gz", [("u://1", "alpha")], gz=True)
    _wet_file(tmp_path, "b.warc.wet.gz", [("u://2", "beta"), ("u://3", "gamma")], gz=True)
    got = read_wet(spark, str(tmp_path)).collect()
    assert sorted(r["text"] for r in got) == ["alpha", "beta", "gamma"]


def test_wet_to_documents_contract(spark, tmp_path):
    path = _wet_file(
        tmp_path,
        "c.warc.wet",
        [
            ("https://News.Example.com/x?q=1", "doc one"),
            ("not-a-url", "doc two"),
        ],
    )
    docs = wet_to_documents(read_wet(spark, path))
    assert docs.columns == ["doc_id", "source", "text"]
    rows = {r["text"]: r for r in docs.collect()}
    assert rows["doc one"]["source"] == "news.example.com"
    assert rows["doc two"]["source"] == "unknown"
    # content-addressed ids: stable across re-reads
    again = {r["text"]: r["doc_id"] for r in wet_to_documents(
        read_wet(spark, path)
    ).collect()}
    assert {t: r["doc_id"] for t, r in rows.items()} == again


def test_read_warc_exact_binary_framing(spark, tmp_path):
    """The exact reader recovers payloads byte-precise via
    Content-Length — including a payload that CONTAINS the record
    delimiter sequence (the case the scan-speed WET reader documents
    as its framing caveat)."""
    tricky = b"\x00\x01binary\r\n\r\nWARC/1.0\r\nnot-a-header\xff\xfe"
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.com/bin\r\n"
        b"WARC-Date: 2026-01-05T10:00:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:bin-1>\r\n"
        b"Content-Type: application/octet-stream\r\n"
        + f"Content-Length: {len(tricky)}\r\n\r\n".encode()
    )
    req = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:req-1>\r\n"
        b"Content-Length: 2\r\n\r\nGE\r\n\r\n"
    )
    p = tmp_path / "x.warc"
    p.write_bytes(hdr + tricky + b"\r\n\r\n" + req)
    got = {r["record_id"]: r for r in read_warc(spark, str(p)).collect()}
    assert bytes(got["<urn:uuid:bin-1>"]["payload"]) == tricky
    assert got["<urn:uuid:bin-1>"]["content_type"] == "application/octet-stream"
    assert bytes(got["<urn:uuid:req-1>"]["payload"]) == b"GE"


def test_read_warc_per_record_gzip_members(spark, tmp_path):
    """WARC.gz layout: one gzip member PER RECORD, concatenated —
    the kernel's member-safe decompression reads all of them."""
    recs = [
        _wet_record("conversion", f"u://{i}", f"text {i}", f"g-{i}")
        for i in range(3)
    ]
    p = tmp_path / "m.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in recs))
    got = read_warc(spark, str(p))
    rows = sorted(
        (r["url"], bytes(r["payload"]).decode()) for r in got.collect()
    )
    assert rows == [(f"u://{i}", f"text {i}") for i in range(3)]


def test_cli_pipeline_wet(spark, tmp_path):
    """python -m cayley_spark pipeline wet: crawl dir -> documents
    parquet (the on-ramp for every other pipeline verb)."""
    from cayley_spark.__main__ import main

    (tmp_path / "crawl").mkdir()
    _wet_file(
        tmp_path / "crawl",
        "s.warc.wet",
        [("https://a.example.com/1", "hello world one"),
         ("https://b.example.com/2", "hello world two")],
    )
    out = str(tmp_path / "docs")
    assert main([
        "pipeline", "wet", "--in", str(tmp_path / "crawl"), "--out", out,
    ]) == 0
    got = spark.read.parquet(out)
    assert got.columns == ["doc_id", "source", "text"]
    assert sorted(r["source"] for r in got.collect()) == [
        "a.example.com", "b.example.com",
    ]


def test_wet_feeds_the_corpus_pipeline_contract(spark, tmp_path):
    """End-to-end smoke: WET -> documents contract -> a text-stack
    operator consumes it without schema friction."""
    from cayley_spark.functions.text import quality_stats

    path = _wet_file(
        tmp_path, "d.warc.wet",
        [(f"https://s{i}.example.com/p", f"the quick brown fox {i} jumps.")
         for i in range(4)],
    )
    docs = wet_to_documents(read_wet(spark, path))
    out = quality_stats(docs, id_col="doc_id", text_col="text")
    assert out.count() == 4


def test_read_warc_malformed_record_raises_with_context(spark, tmp_path):
    """One corrupt record mid-file must RAISE (file + offset), not
    silently truncate the rest of the segment."""
    import pytest

    good = _wet_record("conversion", "u://ok", "good text", "ok")
    # record with a missing Content-Length header
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n\r\npayload\r\n\r\n"
    )
    p = tmp_path / "bad.warc"
    p.write_bytes(good + bad + good)
    with pytest.raises(Exception, match="Content-Length"):
        read_warc(spark, str(p)).collect()
    # truncated payload: declared length runs past end of data
    p2 = tmp_path / "trunc.warc"
    p2.write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:t>\r\nContent-Length: 9999\r\n\r\nshort"
    )
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, str(p2)).collect()


def test_read_warc_gz_trailing_garbage_tolerated(spark, tmp_path):
    """Padding/garbage bytes after the final gzip member must not
    crash the read (seen in the wild); complete members all parse."""
    recs = [
        _wet_record("conversion", f"u://{i}", f"text {i}", f"t-{i}")
        for i in range(2)
    ]
    p = tmp_path / "pad.warc.gz"
    p.write_bytes(
        b"".join(gzip.compress(r) for r in recs) + b"\x00\x00PADDING"
    )
    got = sorted(r["url"] for r in read_warc(spark, str(p)).collect())
    assert got == ["u://0", "u://1"]


def test_wet_to_documents_uppercase_scheme(spark, tmp_path):
    """RFC 3986: schemes are case-insensitive — 'HTTPS://Host/x'
    must attribute to the host, not to 'unknown'."""
    path = _wet_file(
        tmp_path, "up.warc.wet",
        [("HTTPS://Upper.Example.com/x", "upper scheme doc")],
    )
    rows = wet_to_documents(read_wet(spark, path)).collect()
    assert rows[0]["source"] == "upper.example.com"


def test_read_wet_version_mismatch_fails_loudly(spark, tmp_path):
    """A WET file framed by any non-1.0 WARC version never splits on
    the 1.0 line separator — before the round-14 guard it silently
    yielded ZERO rows (the giant record's warcinfo type filtered it).
    The in-plan guard must fail the job loudly instead."""
    import pytest

    blob = _wet_record("warcinfo", None, "software: synthetic", "info")
    blob += _wet_record("conversion", "u://1", "some text", "r-0")
    blob = blob.replace(b"WARC/1.0", b"WARC/1.1")
    p = tmp_path / "v11.warc.wet"
    p.write_bytes(blob)
    with pytest.raises(Exception, match="WARC/1.0-framed|assert"):
        read_wet(spark, str(p)).collect()
    # mixed versions: the file OPENS 1.0 (so the start check passes)
    # but a later record is 1.1 — the unconsumed-boundary check fires
    mixed = _wet_record("warcinfo", None, "software: synthetic", "info")
    mixed += _wet_record("conversion", "u://1", "ok text", "r-0")
    mixed += _wet_record("conversion", "u://2", "lost text", "r-1").replace(
        b"WARC/1.0", b"WARC/1.1"
    )
    p2 = tmp_path / "mixed.warc.wet"
    p2.write_bytes(mixed)
    with pytest.raises(Exception, match="WARC/1.0-framed|assert"):
        read_wet(spark, str(p2)).collect()
    # control: a well-formed 1.0 file still parses
    ok = _wet_file(tmp_path, "ok.warc.wet", [("u://9", "fine")])
    assert read_wet(spark, ok).count() == 1


def test_read_wet_header_names_case_insensitive(spark, tmp_path):
    """ISO 28500 field names are case-insensitive: a legal
    non-canonical WET file ('warc-target-uri:', 'content-length:')
    must not silently produce empty url/record_id or null
    content_length."""
    blob = _wet_record("warcinfo", None, "software: synthetic", "info")
    rec = _wet_record("conversion", "https://lc.example.com/x", "lower hdrs", "lc-0")
    rec = (
        rec.replace(b"WARC-Type:", b"warc-type:")
        .replace(b"WARC-Target-URI:", b"warc-target-uri:")
        .replace(b"WARC-Record-ID:", b"WARC-RECORD-ID:")
        .replace(b"Content-Length:", b"content-length:")
    )
    p = tmp_path / "lc.warc.wet"
    p.write_bytes(blob + rec)
    got = read_wet(spark, str(p)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["url"] == "https://lc.example.com/x"
    assert r["record_id"] == "<urn:uuid:lc-0>"
    assert r["content_length"] == len(b"lower hdrs")


def test_wet_to_documents_strips_authority_userinfo(spark, tmp_path):
    """RFC 3986 authority userinfo must not leak into the source key:
    'https://user@host/' attributes 'host' (not 'user@host') and
    'https://u:p@host:8080/' attributes 'host' (not 'u')."""
    path = _wet_file(
        tmp_path, "ui.warc.wet",
        [
            ("https://user@host.example.com/a", "userinfo doc"),
            ("https://u:p@host.example.com:8080/b", "userinfo port doc"),
            ("https://plain.example.com/c", "plain doc"),
        ],
    )
    rows = {r["text"]: r["source"] for r in wet_to_documents(
        read_wet(spark, path)
    ).collect()}
    assert rows["userinfo doc"] == "host.example.com"
    assert rows["userinfo port doc"] == "host.example.com"
    assert rows["plain doc"] == "plain.example.com"


def test_admit_corpus_stream_rejects_geometry_kwargs(spark, tmp_path):
    """admit_corpus_stream always takes LSH geometry from the saved
    index; passing num_hashes/bands/minhash_k must fail at CALL time
    with a clear message, not as a duplicate-kwarg TypeError inside
    the first micro-batch."""
    import pytest

    from cayley_spark.streaming.admission import admit_corpus_stream

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value as doc_id", "'x' as text", "'s' as source")
    )
    with pytest.raises(ValueError, match="geometry always follows"):
        admit_corpus_stream(
            stream,
            str(tmp_path / "sub"),
            str(tmp_path / "lsh"),
            str(tmp_path / "out"),
            num_hashes=64,
        )
