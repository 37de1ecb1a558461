"""Structured Streaming ingest + schema ORM roundtrip tests."""

import os
import shutil
import time
import uuid

import pytest
from dataclasses import dataclass, field

from cayley_spark import GraphStore, IRI, Path
from cayley_spark.schema import load_to, quad_field, register_type, write_as_quads


def test_stream_ingest_roundtrip(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    src, store, ckpt = f"{base}/in", f"{base}/store", f"{base}/ckpt"
    os.makedirs(src)
    with open(f"{src}/batch1.nq", "w") as f:
        f.write("<alice> <follows> <bob> .\n<bob> <follows> <carol> .\n")
    with open(f"{src}/batch2.nq", "w") as f:
        f.write("<carol> <follows> <alice> .\n<alice> <follows> <carol> .\n")

    from cayley_spark.streaming.ingest import read_quad_stream, stream_to_store

    q = stream_to_store(
        read_quad_stream(spark, src), store, ckpt, trigger_available_now=True
    )
    q.awaitTermination(120)

    st = GraphStore.load(spark, store, dedup_nodes=True)
    assert st.stats()["quads"] == 4
    got = sorted(Path.start(st, IRI("carol")).in_(IRI("follows")).all_values())
    assert got == ["<alice>", "<bob>"]

    # incremental: a third file appears, the stream picks it up
    with open(f"{src}/batch3.nq", "w") as f:
        f.write("<dave> <follows> <carol> .\n")
    q2 = stream_to_store(
        read_quad_stream(spark, src), store, ckpt, trigger_available_now=True
    )
    q2.awaitTermination(120)
    st2 = GraphStore.load(spark, store, dedup_nodes=True)
    assert st2.stats()["quads"] == 5
    got = sorted(Path.start(st2, IRI("carol")).in_(IRI("follows")).all_values())
    assert got == ["<alice>", "<bob>", "<dave>"]


@dataclass
class Person:
    id: object = None
    name: str = quad_field("<name>")
    follows: list = quad_field("<follows>", default_factory=list)


def test_schema_roundtrip(spark):
    register_type(Person, "<Person>")
    alice = Person(id=IRI("alice"), name="Alice", follows=[IRI("bob")])
    bob = Person(id=IRI("bob"), name="Bob")
    quads = write_as_quads([alice, bob])
    # 2 type rows + 2 names + 1 follows
    assert len(quads) == 5

    st = GraphStore.from_quad_values(spark, quads)
    people = load_to(st, Person)
    assert [p.name for p in people] == ["Alice", "Bob"]
    assert people[0].follows == ["<bob>"]  # IRI native form

    only_bob = load_to(st, Person, ids=[IRI("bob")])
    assert len(only_bob) == 1 and only_bob[0].name == "Bob"


def test_schema_required_field_skip(spark):
    register_type(Person, "<Person>")
    quads = write_as_quads([Person(id=IRI("x"), name="X")])
    # a typed node with no <name> edge must be skipped on load
    quads.append((IRI("ghost"), IRI("rdf:type"), IRI("Person")))
    st = GraphStore.from_quad_values(spark, quads)
    people = load_to(st, Person)
    assert [p.name for p in people] == ["X"]


def test_pquads_roundtrip(spark, tmp_path):
    """pquads write → read roundtrip across every value kind
    (reference quad/pquads; format doc in sources/pquads.py)."""
    from datetime import datetime

    from cayley_spark import GraphStore, IRI, Path, String
    from cayley_spark.sources.pquads import (
        decode_quad,
        encode_quad,
        read_pquads,
        write_pquads,
    )
    from cayley_spark.values import (
        BNode,
        Bool,
        Float,
        Int,
        LangString,
        Time,
        TypedString,
    )

    quads = [
        (IRI("alice"), IRI("follows"), IRI("bob")),
        (IRI("alice"), IRI("name"), LangString("Alice", "en"), IRI("g1")),
        (BNode("x"), IRI("age"), Int(-42)),
        (BNode("x"), IRI("score"), Float(2.5)),
        (BNode("x"), IRI("ok"), Bool(True)),
        (BNode("x"), IRI("t"), TypedString("z", "http://x/T")),
        (BNode("x"), IRI("when"), Time(datetime(2006, 1, 2, 15, 4, 5, 123000))),
        (IRI("s"), IRI("says"), String('multi\nline "quoted"')),
    ]
    # codec-level roundtrip (every kind, label and no-label)
    for q in quads:
        s, p, o = q[0], q[1], q[2]
        l = q[3] if len(q) == 4 else None
        got = decode_quad(encode_quad(s, p, o, l))
        assert got == (s, p, o, l), q
    # file-level roundtrip through a store
    st = GraphStore.from_quad_values(spark, quads)
    path = str(tmp_path / "dump.pq")
    n = write_pquads(st, path)
    assert n == 8
    st2 = read_pquads(spark, path)
    assert st2.stats() == st.stats()
    assert sorted(
        Path.start(st2, IRI("bob")).in_(IRI("follows")).all_values()
    ) == ["<alice>"]
    # gzip variant
    gz = str(tmp_path / "dump.pq.gz")
    write_pquads(st, gz)
    assert read_pquads(spark, gz).stats() == st.stats()


def test_jsonld_full_features(spark, tmp_path):
    """JSON-LD reader: @base, blank nodes, @value literals, @list
    collections (rdf:first/rest chains)."""
    import json as _json

    from cayley_spark import IRI, Path
    from cayley_spark.sources.formats import read_jsonld

    doc = {
        "@context": {"@base": "http://x/", "@vocab": "http://x/"},
        "@graph": [
            {
                "@id": "alice",
                "knows": {"name": "Anon"},  # blank node
                "age": {"@value": "30", "@type": "http://x/Age"},
                "friends": {"@list": [{"@id": "bob"}, {"@id": "carol"}]},
                "label": {"@value": "hi", "@language": "en"},
            }
        ],
    }
    p = tmp_path / "doc.jsonld"
    p.write_text(_json.dumps(doc))
    st = read_jsonld(spark, str(p))
    alice = IRI("http://x/alice")
    # blank node object reachable
    got = Path.start(st, alice).out(IRI("http://x/knows")).out(
        IRI("http://x/name")
    ).all_values()
    assert got == ['"Anon"']
    # typed + lang literals
    assert Path.start(st, alice).out(IRI("http://x/age")).all_values() == [
        '"30"^^<http://x/Age>'
    ]
    assert Path.start(st, alice).out(IRI("http://x/label")).all_values() == [
        '"hi"@en'
    ]
    # @list chain: first cell holds bob, rest->rest->nil
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    first_vals = (
        Path.start(st, alice)
        .out(IRI("http://x/friends"))
        .out(IRI(rdf + "first"))
        .all_values()
    )
    assert first_vals == ["<http://x/bob>"]
    tail = (
        Path.start(st, alice)
        .out(IRI("http://x/friends"))
        .follow_recursive(IRI(rdf + "rest"))
        .out(IRI(rdf + "first"))
        .all_values()
    )
    assert tail == ["<http://x/carol>"]


def test_sessionize_batch_vs_stream(spark, tmp_path):
    """Gap sessionization: the declarative batch operator and the
    applyInPandasWithState streaming operator agree (streaming emits
    only CLOSED sessions; open ones stay in state)."""
    from pyspark.sql import functions as F

    from cayley_spark.streaming.sessions import sessionize, sessionize_stream

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # > 30min gap -> closes session 1
        (1, "2024-01-01 02:05:00"),
        (1, "2024-01-01 05:00:00"),  # closes session 2; stays open
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 03:00:00"),  # closes user-2 session 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    batch = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2) in batch
    assert (1, "2024-01-01 02:00:00", "2024-01-01 02:05:00", 2) in batch
    assert len(batch) == 5

    src = tmp_path / "stream_in"
    src.mkdir()
    import json as _json

    with open(src / "events.json", "w") as f:
        for uid, ts in rows:
            f.write(_json.dumps({"user_id": uid, "ts": ts}) + "\n")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.table("sess_out").collect()
    }
    # closed sessions = batch sessions minus the trailing open one per user
    open_sessions = {
        max((b for b in batch if b[0] == uid), key=lambda b: b[1])
        for uid in (1, 2)
    }
    assert got == batch - open_sessions


def test_windowed_counts_batch_vs_stream(spark, tmp_path):
    """The windowed rollup incrementalizes: batch run and streaming
    run (append mode, watermark-closed windows) agree on every closed
    window; late-but-within-watermark events land in their window."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from cayley_spark.streaming.aggregates import windowed_counts

    batches = [
        [(1, "2024-01-01 00:10:00", "click", 1.0),
         (2, "2024-01-01 00:40:00", "view", 2.0)],
        # late event for hour 0 (within the 2h watermark) + hour 1
        [(3, "2024-01-01 00:50:00", "click", 3.0),
         (4, "2024-01-01 01:20:00", "click", 4.0)],
        # hour 4 advances the watermark past hours 0-1 -> they close
        [(5, "2024-01-01 04:00:00", "view", 5.0)],
        [(6, "2024-01-01 04:05:00", "view", 6.0)],
        # hour 7 closes hour 4
        [(7, "2024-01-01 07:00:00", "click", 7.0)],
    ]
    src = tmp_path / "in"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for eid, ts, et, v in rows:
                f.write(_json.dumps(
                    {"event_id": eid, "ts": ts, "event_type": et, "value": v}
                ) + "\n")
        _os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in spark.table("win_out").collect()
    }
    # batch truth over the same rows, restricted to CLOSED windows
    # (watermark stopped at 07:00 - 2h = 05:00 -> hour 7 still open)
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, "event_id long, ts string, event_type string, value double") \
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    batch = {
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in windowed_counts(df).collect()
        if str(r["window_start"]) < "2024-01-01 05:00:00"
    }
    assert got == batch
    # the late 00:50 event is IN the hour-0 click aggregate
    assert ("2024-01-01 00:00:00", "click", 2, 4.0) in got


def test_sessionize_fractional_gap(spark):
    """Fractional gap_seconds behave identically for timestamp-typed
    and numeric ts columns (ADVICE round 3: the INTERVAL branch used
    to truncate 0.5 -> 0 and split every event into its own session)."""
    from pyspark.sql import functions as F

    from cayley_spark.streaming.sessions import sessionize

    rows = [(1, 0.0), (1, 0.4), (1, 1.2)]  # gaps 0.4s, 0.8s
    num = spark.createDataFrame(rows, "user_id long, ts double")
    ts = num.select(
        "user_id", F.timestamp_seconds(F.col("ts")).alias("ts")
    )
    n_num = sessionize(num, gap_seconds=0.5).count()
    n_ts = sessionize(ts, gap_seconds=0.5).count()
    # 0.4 <= 0.5 merges, 0.8 > 0.5 splits -> exactly 2 sessions
    assert n_num == n_ts == 2


def test_sessionize_stream_state_expiry(spark, tmp_path):
    """With a watermark on the input, open-session state EXPIRES: once
    the watermark passes end+gap the session is emitted closed and the
    key's state removed — a later event for that key opens a NEW
    session (VERDICT round 3 #5). Without expiry, keys 1's sessions
    would never be emitted (no later key-1 event closes them)."""
    import json as _json
    import os as _os

    from cayley_spark.streaming.sessions import sessionize_stream

    # per-file micro-batches; u2 is the "clock" advancing the watermark
    batches = [
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (2, "2024-01-01 00:05:00")],
        [(2, "2024-01-01 02:00:00")],   # wm -> ~02:00 after this batch
        [(2, "2024-01-01 02:05:00")],   # u1 (timeout 00:40) expires here
        [(1, "2024-01-01 03:00:00")],   # u1 reopens: NEW session
        [(2, "2024-01-01 06:00:00")],   # wm -> ~06:00
        [(2, "2024-01-01 06:05:00")],   # u1's second session expires
    ]
    src = tmp_path / "in"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for uid, ts in rows:
                f.write(_json.dumps({"user_id": uid, "ts": ts}) + "\n")
        _os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "10 seconds")
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.table("sess_ttl").collect()
    }
    assert got == {
        # u1's sessions arrive via EXPIRY (no later u1 event closed them)
        (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        (1, "2024-01-01 03:00:00", "2024-01-01 03:00:00", 1),
        # u2's sessions close normally via later events
        (2, "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1),
        (2, "2024-01-01 02:00:00", "2024-01-01 02:05:00", 2),
    }


def test_json_quads_roundtrip(spark, tmp_path):
    from cayley_spark import GraphStore, IRI, Path, String
    from cayley_spark.sources.formats import read_json_quads, write_json_quads
    from cayley_spark.values import LangString

    st = GraphStore.from_quad_values(
        spark,
        [
            (IRI("alice"), IRI("follows"), IRI("bob")),
            (IRI("alice"), IRI("name"), LangString("Alice", "en"), IRI("g1")),
            (IRI("bob"), IRI("says"), String('multi "quoted"')),
        ],
    )
    p = tmp_path / "quads.json"
    p.write_text(write_json_quads(st))
    st2 = read_json_quads(spark, str(p))
    assert st2.stats() == st.stats()
    assert Path.start(st2, IRI("bob")).in_(IRI("follows")).all_values() == [
        "<alice>"
    ]
    # bare strings parse as IRIs
    p2 = tmp_path / "bare.json"
    p2.write_text('[{"subject": "x", "predicate": "p", "object": "<y>"}]')
    st3 = read_json_quads(spark, str(p2))
    assert Path.start(st3, IRI("x")).out(IRI("p")).all_values() == ["<y>"]


def test_cli_load_dump_convert(spark, tmp_path):
    """python -m cayley_spark load/dump/convert (reference cmd/cayley
    database.go / convert.go), exercised in-process."""
    from cayley_spark.__main__ import main

    nq = tmp_path / "in.nq"
    nq.write_text(
        "<alice> <follows> <bob> .\n"
        '<bob> <status> "cool" <g1> .\n'
    )
    db = str(tmp_path / "db")
    assert main(["load", "--db", db, "--quads", str(nq)]) == 0
    out_pq = str(tmp_path / "out.pq")
    assert main(["dump", "--db", db, "--out", out_pq]) == 0
    back_nq = str(tmp_path / "back.nq")
    assert main(["convert", "--src", out_pq, "--dst", back_nq]) == 0
    got = sorted(
        line for line in open(back_nq).read().splitlines() if line.strip()
    )
    assert got == sorted(nq.read_text().splitlines())


def test_cli_init_and_load_init(spark, tmp_path, capsys):
    """python -m cayley_spark init / load --init (reference
    cmd/cayley/command/database.go:66-80,101-104,135): init creates an
    empty store, errors if one exists; init --quads loads after
    bootstrap; load --init bootstraps first."""
    from cayley_spark import GraphStore
    from cayley_spark.__main__ import main

    db = str(tmp_path / "db")
    assert main(["init", "--db", db]) == 0
    assert GraphStore.load(spark, db).stats() == {"nodes": 0, "quads": 0}
    # second init errors (ErrDatabaseExists semantics)
    assert main(["init", "--db", db]) == 1
    assert "already exists" in capsys.readouterr().err

    nq = tmp_path / "in.nq"
    nq.write_text("<a> <p> <b> .\n")
    db2 = str(tmp_path / "db2")
    assert main(["init", "--db", db2, "--quads", str(nq)]) == 0
    assert GraphStore.load(spark, db2).stats()["quads"] == 1
    db3 = str(tmp_path / "db3")
    assert main(["load", "--db", db3, "--quads", str(nq), "--init"]) == 0
    assert GraphStore.load(spark, db3).stats()["quads"] == 1


def test_cli_dedup(spark, tmp_path, capsys):
    """python -m cayley_spark dedup --type T (reference
    cmd/cayley/command/dedup.go): same-typed bnodes with identical
    properties merge; node count drops; --type is mandatory."""
    from cayley_spark import GraphStore, IRI, Path
    from cayley_spark.__main__ import main

    nq = tmp_path / "in.nq"
    nq.write_text(
        "_:b1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <Person> .\n"
        "_:b2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <Person> .\n"
        '_:b1 <name> "ann" .\n'
        '_:b2 <name> "ann" .\n'
        "<x> <knows> _:b1 .\n"
        "<y> <knows> _:b2 .\n"
    )
    db = str(tmp_path / "db")
    assert main(["load", "--db", db, "--quads", str(nq)]) == 0
    # missing --type errors, mirroring the reference message
    assert main(["dedup", "--db", db]) == 1
    assert "no type is specified" in capsys.readouterr().err
    assert main(["dedup", "--db", db, "--type", "<Person>"]) == 0
    out = capsys.readouterr().out
    st = GraphStore.load(spark, db)
    # b1/b2 merged: one bnode remains, both x and y point at it
    assert st.nodes.where("kind = 'bnode'").count() == 1
    knows = Path.start(st, IRI("x")).out(IRI("knows")).in_(IRI("knows"))
    assert sorted(knows.all_values()) == ["<x>", "<y>"]
    assert "->" in out


def test_cli_query(spark, tmp_path, capsys):
    """python -m cayley_spark query — one JSON result per line
    (reference cmd/cayley/command/repl.go:76-80 NewQueryCmd)."""
    import json as _json

    from cayley_spark.__main__ import main

    nq = tmp_path / "in.nq"
    nq.write_text("<alice> <follows> <bob> .\n<carol> <follows> <bob> .\n")
    db = str(tmp_path / "db")
    assert main(["load", "--db", db, "--quads", str(nq)]) == 0
    capsys.readouterr()
    assert main([
        "query", "--db", db, 'g.V("<bob>").in("<follows>").all()'
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    got = sorted(_json.loads(l)["id"] for l in lines)
    assert got == ["<alice>", "<carol>"]


def test_cli_health_and_schema(social, capsys):
    """python -m cayley_spark health / schema linkedql (reference
    cmd/cayley/command/health.go, schema.go)."""
    import json as _json

    from cayley_spark.__main__ import main
    from cayley_spark.server.http import start_background

    server, _ = start_background(social)
    url = f"http://127.0.0.1:{server.server_address[1]}/"
    try:
        assert main(["health", url]) == 0
        out = capsys.readouterr().out
        assert "ok" in out
    finally:
        server.shutdown()
        server.server_close()
    # dead server -> nonzero
    assert main(["health", url]) == 1
    capsys.readouterr()

    assert main(["schema", "linkedql"]) == 0
    doc = _json.loads(capsys.readouterr().out)
    ids = {n["@id"] for n in doc["@graph"]}
    # classes for every registered step + shared properties
    assert "http://cayley.io/linkedql#Vertex" in ids
    assert "http://cayley.io/linkedql#Collect" in ids
    assert "http://cayley.io/linkedql#from" in ids
    froms = [n for n in doc["@graph"]
             if n["@id"] == "http://cayley.io/linkedql#from"]
    assert froms[0]["@type"] == "owl:ObjectProperty"
    assert froms[0]["rdfs:range"] == {"@id": "http://cayley.io/linkedql#PathStep"}
    # every class has a comment and subClassOf entries
    classes = [n for n in doc["@graph"] if n["@type"] == "rdfs:Class"]
    assert len(classes) == 38
    assert all(n["rdfs:comment"] for n in classes)


def test_pquads_handwritten_wire_fixture(spark, tmp_path):
    """Decode a pquads file whose bytes were hand-assembled straight
    from the public quads.proto wire rules — independent of this
    module's encoder, so symmetric encode/decode bugs cannot hide.
    (True byte parity against a real-cayley-produced file stays
    descoped: the quad/pquads module source and a Go toolchain are
    both absent from this environment; see COVERAGE.md.)"""
    from cayley_spark.sources.pquads import read_pquads
    from cayley_spark.values import IRI, Int, LangString, String

    def uv(n):  # uvarint
        out = b""
        while True:
            b, n = n & 0x7F, n >> 7
            if n:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def ld(field, payload):  # length-delimited field
        return bytes([field << 3 | 2]) + uv(len(payload)) + payload

    # Value{iri=3}, Value{str=2}, Value{int=7 varint}, Value{lang_str=6}
    v_iri_alice = ld(3, b"alice")
    v_iri_knows = ld(3, b"knows")
    v_iri_age = ld(3, b"age")
    v_str_bob = ld(2, b"bob")
    v_int_41 = bytes([7 << 3 | 0]) + uv(41)
    v_lang = ld(6, ld(1, b"hi") + ld(2, b"en"))  # LangString{value,lang}
    # typed quads: Quad{subject_value=5, predicate_value=6, object_value=7}
    q1 = ld(5, v_iri_alice) + ld(6, v_iri_knows) + ld(7, v_str_bob)
    q2 = ld(5, v_iri_alice) + ld(6, v_iri_age) + ld(7, v_int_41)
    q3 = ld(5, v_iri_alice) + ld(6, v_iri_knows) + ld(7, v_lang)
    # strict raw-string form: Quad{subject=1, predicate=2, object=3}
    q4 = ld(1, b"<x>") + ld(2, b"<p>") + ld(3, b'"lit"')
    blob = b"\x00pq\x00" + b"".join(uv(len(q)) + q for q in (q1, q2, q3, q4))

    f = tmp_path / "hand.pq"
    f.write_bytes(blob)
    st = read_pquads(spark, str(f))
    from cayley_spark.sources.nquads import write_nquads

    got = set()
    for r in write_nquads(st).collect():
        s, p, o = r["value"].rstrip(" .").split(" ", 2)
        got.add((s, p, o))
    assert got == {
        ("<alice>", "<knows>", '"bob"'),
        ("<alice>", "<age>", Int(41).term()),
        ("<alice>", "<knows>", LangString("hi", "en").term()),
        ("<x>", "<p>", '"lit"'),
    }


def test_pquads_time_and_wire_edge_cases():
    """Protobuf Timestamp convention (floor seconds, nanos in [0,1e9))
    for pre-1970 fractional times, and unknown-wire-type handling."""
    from datetime import datetime

    from cayley_spark.sources.pquads import (
        _tag,
        _uvarint,
        decode_quad,
        decode_value,
        encode_quad,
        encode_value,
    )
    from cayley_spark.values import IRI, Time

    # pre-1970 fractional second: floor(-0.5) = -1s + 5e8 nanos
    t = Time(datetime(1969, 12, 31, 23, 59, 59, 500000))
    assert decode_value(encode_value(t)) == t
    got = decode_quad(encode_quad(IRI("s"), IRI("p"), t, None))
    assert got == (IRI("s"), IRI("p"), t, None)

    # unknown varint / fixed64 / fixed32 fields are skipped cleanly
    v = encode_value(IRI("x"))
    extra = (
        _tag(15, 0) + _uvarint(7)          # varint
        + _tag(15, 1) + b"\x00" * 8        # fixed64
        + _tag(15, 5) + b"\x00" * 4        # fixed32
    )
    assert decode_value(extra + v) == IRI("x")
    q = encode_quad(IRI("s"), IRI("p"), IRI("o"), None)
    assert decode_quad(extra + q) == (IRI("s"), IRI("p"), IRI("o"), None)

    # group wire types cannot be skipped -> clean error, not garbage
    import pytest as _pytest

    with _pytest.raises(ValueError, match="wire type"):
        decode_value(_tag(15, 3) + v)
    with _pytest.raises(ValueError, match="wire type"):
        decode_quad(_tag(15, 4) + q)


def test_sessionize_stream_out_of_order_batches(spark, tmp_path):
    """A late event in a later micro-batch that precedes the open
    session's start (within gap of its end) widens the session start,
    matching the batch operator (ADVICE round 2)."""
    import json as _json

    from pyspark.sql import functions as F

    from cayley_spark.streaming.sessions import sessionize, sessionize_stream

    batch1 = [(1, "2024-01-01 00:10:00")]
    batch2 = [
        (1, "2024-01-01 00:00:00"),  # late: before open-session start
        (1, "2024-01-01 02:00:00"),  # > gap -> closes the session
    ]
    import os as _os

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # two files -> two micro-batches (maxFilesPerTrigger=1); mtimes
    # force batch order (the file source orders by timestamp)
    for i, (rows, name) in enumerate([(batch1, "b1.json"), (batch2, "b2.json")]):
        with open(src / name, "w") as f:
            for uid, ts in rows:
                f.write(_json.dumps({"user_id": uid, "ts": ts}) + "\n")
        _os.utime(src / name, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # two source files must have produced two stateful micro-batches
    assert len(q.recentProgress) >= 2
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.table("sess_ooo").collect()
    }
    assert got == {(1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2)}

    # and the batch operator agrees on the closed session
    df = spark.createDataFrame(
        batch1 + batch2, "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    batch = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2) in batch


def test_dedup_stream_drops_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates within the watermark horizon
    are dropped across micro-batches; state expires with the
    watermark, so a far-later duplicate is admitted again; batch mode
    degrades to plain content dropDuplicates."""
    import json as _json
    import os as _os

    from cayley_spark.streaming.dedup import dedup_stream

    batches = [
        [(1, "2024-01-01 00:00:00", "alpha"),
         (2, "2024-01-01 00:05:00", "beta")],
        # in-horizon duplicate of alpha -> dropped
        [(3, "2024-01-01 00:10:00", "alpha"),
         (4, "2024-01-01 00:20:00", "gamma")],
        # advance the watermark far past alpha's state (1h horizon)
        [(5, "2024-01-01 06:00:00", "delta")],
        # eviction lags one batch behind the watermark advance (state
        # cleanup runs at the end of the batch that OPERATES under the
        # new watermark) — this batch runs at wm 05:00 and evicts alpha
        [(7, "2024-01-01 06:05:00", "epsilon")],
        # alpha's state expired -> admitted again
        [(6, "2024-01-01 06:10:00", "alpha")],
    ]
    src = tmp_path / "dd_in"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, ts, text in rows:
                f.write(_json.dumps(
                    {"doc_id": did, "ts": ts, "text": text}) + "\n")
        _os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.sql("SELECT * FROM dd_out").collect()}
    assert 1 in kept and 2 in kept and 4 in kept and 5 in kept and 7 in kept
    assert 3 not in kept          # in-horizon duplicate dropped
    assert 6 in kept              # state expired -> re-admitted
    # batch twin: one row per distinct content
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    ).withColumn("ts", __import__("pyspark").sql.functions.current_timestamp())
    out = dedup_stream(batch).collect()
    assert sorted(r["text"] for r in out) == ["x", "y"]


def test_cli_pipeline_verbs(spark, tmp_path, capsys):
    """python -m cayley_spark pipeline {dedup,chunk,pack,split,quality}:
    parquet-in/parquet-out corpus transforms."""
    from cayley_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, ("alpha beta gamma " * 5) if i < 2 else f"unique doc {i} "
          * 4) for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(src)

    out = str(tmp_path / "dd")
    assert main(["pipeline", "dedup", "--in", src, "--out", out,
                 "--jaccard-threshold", "0.5"]) == 0
    kept = spark.read.parquet(out)
    assert kept.count() == 5  # docs 0/1 identical -> one survives
    assert set(kept.columns) == {"doc_id", "text"}

    out = str(tmp_path / "ch")
    assert main(["pipeline", "chunk", "--in", src, "--out", out,
                 "--chunk-chars", "16"]) == 0
    ch = spark.read.parquet(out)
    assert ch.count() > 6 and "chunk_text" in ch.columns

    out = str(tmp_path / "pk")
    assert main(["pipeline", "pack", "--in", src, "--out", out,
                 "--budget", "10"]) == 0
    pk = spark.read.parquet(out)
    assert {"offset", "bin"} <= set(pk.columns) and pk.count() == 6

    out = str(tmp_path / "sp")
    assert main(["pipeline", "split", "--in", src, "--out", out]) == 0
    sp = spark.read.parquet(out)
    assert sp.count() == 6 and "split" in sp.columns and "text" in sp.columns

    out = str(tmp_path / "ql")
    assert main(["pipeline", "quality", "--in", src, "--out", out]) == 0
    ql = spark.read.parquet(out)
    assert ql.count() == 6 and "top_token_ratio" in ql.columns

    out = str(tmp_path / "sn")
    assert main(["pipeline", "spans", "--in", src, "--out", out,
                 "--span-k", "3"]) == 0
    sn = spark.read.parquet(out)
    # docs 0/1 share all their 3-gram spans
    assert sn.count() == 2 and "n_dup_spans" in sn.columns

    out = str(tmp_path / "ss")
    assert main(["pipeline", "substr", "--in", src, "--out", out,
                 "--substr-k", "3"]) == 0
    ss = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    # ExactSubstr keep-one: doc 0 keeps the repeated passage, doc 1
    # (same text) loses it entirely
    assert len(ss) == 6 and ss[0]["n_removed"] < ss[1]["n_removed"]
    assert ss[1]["clean_text"] == ""

    out = str(tmp_path / "tr")
    assert main(["pipeline", "tiers", "--in", src, "--out", out,
                 "--n-buckets", "3"]) == 0
    tr = spark.read.parquet(out)
    assert tr.count() == 6 and set(
        r["bucket"] for r in tr.collect()
    ) == {1, 2, 3}

    out = str(tmp_path / "pdd")
    assert main(["pipeline", "paradedup", "--in", src, "--out", out]) == 0
    pdd = spark.read.parquet(out)
    assert pdd.count() == 6 and "clean_text" in pdd.columns


def test_neardup_stream_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH near-dup (streaming/neardup.py): the
    stateful bucket operator and the declarative batch twin emit the
    same pairs when every arrival is within the horizon."""
    import json as _json

    from pyspark.sql import functions as F

    from cayley_spark.streaming.neardup import (
        neardup_pairs_batch,
        neardup_pairs_stream,
    )

    rows = [
        (1, "2024-01-01 00:00:00", "the quick brown fox jumps over the lazy dog"),
        (2, "2024-01-01 00:05:00", "the quick brown fox jumps over the lazy cat"),
        (3, "2024-01-01 00:10:00", "completely unrelated text about spark plans"),
        (4, "2024-01-01 00:15:00", "the quick brown fox jumps over the lazy dog"),
        (5, "2024-01-01 00:20:00", "short"),  # < k tokens: ignored
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6), r["band"])
        for r in neardup_pairs_batch(df, threshold=0.5).collect()
    }
    # the exact dup (1,4) must be found in every band; (1,2) in >=1
    assert {(a, b) for a, b, _, _ in batch} >= {(1, 4), (1, 2)}
    assert all(3 not in (a, b) and 5 not in (a, b) for a, b, _, _ in batch)

    src = tmp_path / "nd_in"
    src.mkdir()
    with open(src / "docs.json", "w") as f:
        for did, ts, text in rows:
            f.write(_json.dumps({"doc_id": did, "ts": ts, "text": text}) + "\n")
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).json(str(src))
    q = (
        neardup_pairs_stream(stream, watermark="1 hour", threshold=0.5)
        .writeStream.format("memory")
        .queryName("nd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6), r["band"])
        for r in spark.table("nd_out").collect()
    }
    assert got == batch


def test_neardup_stream_string_ids(spark, tmp_path):
    """Non-long doc ids: the output/state id type follows the input
    schema (as the batch twin's always did) instead of the former
    hardcoded bigint, which crashed on string ids."""
    import json as _json

    from pyspark.sql import functions as F

    from cayley_spark.streaming.neardup import (
        neardup_pairs_batch,
        neardup_pairs_stream,
    )

    rows = [
        ("doc-a", "2024-01-01 00:00:00", "the quick brown fox jumps over the lazy dog"),
        ("doc-b", "2024-01-01 00:05:00", "the quick brown fox jumps over the lazy dog"),
        ("doc-c", "2024-01-01 00:10:00", "completely unrelated text about spark plans"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6), r["band"])
        for r in neardup_pairs_batch(df, threshold=0.5).collect()
    }
    assert {(a, b) for a, b, _, _ in batch} == {("doc-a", "doc-b")}

    src = tmp_path / "nds_in"
    src.mkdir()
    with open(src / "docs.json", "w") as f:
        for did, ts, text in rows:
            f.write(_json.dumps({"doc_id": did, "ts": ts, "text": text}) + "\n")
    stream = spark.readStream.schema(
        "doc_id string, ts timestamp, text string"
    ).json(str(src))
    q = (
        neardup_pairs_stream(stream, watermark="1 hour", threshold=0.5)
        .writeStream.format("memory")
        .queryName("nds_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nds_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 6), r["band"])
        for r in spark.table("nds_out").collect()
    }
    assert got == batch


def test_neardup_stream_state_expiry(spark, tmp_path):
    """A near-dup arriving AFTER the watermark horizon is not paired
    (its partner's bucket state expired) — bounded state is the
    contract, the periodic batch sweep is the backstop."""
    import json as _json

    from cayley_spark.streaming.neardup import neardup_pairs_stream

    text = "the quick brown fox jumps over the lazy dog"
    early = [(1, "2024-01-01 00:00:00", text)]
    # a filler batch advances the watermark past 00:00 + horizon, so
    # doc 1's bucket state times out BEFORE its duplicate arrives
    # (state eviction lags one micro-batch behind the watermark
    # advance — the same one-directional contract dedup_stream
    # documents — hence the separate filler batch)
    filler = [(9, "2024-01-01 06:00:00", "unrelated filler words to move time")]
    late = [
        (2, "2024-01-01 06:01:00", text),  # dup of 1, but 1 expired
        (3, "2024-01-01 06:02:00", text),  # pairs with 2 (same batch window)
    ]
    src = tmp_path / "ndx_in"
    src.mkdir()
    for i, chunk in enumerate([early, filler, late]):
        with open(src / f"b{i}.json", "w") as f:
            for did, ts, t in chunk:
                f.write(_json.dumps({"doc_id": did, "ts": ts, "text": t}) + "\n")
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).json(str(src))
    q = (
        neardup_pairs_stream(stream, watermark="10 minutes", threshold=0.5)
        .writeStream.format("memory")
        .queryName("ndx_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ndx_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {
        (r["id_a"], r["id_b"]) for r in spark.table("ndx_out").collect()
    }
    assert (2, 3) in pairs  # same-horizon dup found
    assert all(a != 1 for a, _ in pairs)  # expired doc 1 never pairs


def test_cli_pipeline_html_mix_shard(spark, tmp_path, capsys):
    """CLI parity for the round-5 operators: pipeline {html,mix,shard}."""
    from pyspark.sql import Row

    from cayley_spark.__main__ import main as cli

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [
            Row(doc_id=i, source="big" if i < 40 else "small",
                text=f"document {i} body words here",
                html=f"<p>document {i} body</p><script>x()</script>")
            for i in range(50)
        ]
    ).write.parquet(src)

    out1 = str(tmp_path / "html_out")
    assert cli(["pipeline", "html", "--in", src, "--out", out1]) == 0
    got = spark.read.parquet(out1)
    assert got.count() == 50 and set(got.columns) == {"doc_id", "text", "n_tokens"}
    assert "script" not in got.first()["text"]

    out2 = str(tmp_path / "mix_out")
    assert cli(["pipeline", "mix", "--in", src, "--out", out2,
                "--alpha", "0.25"]) == 0
    assert 0 < spark.read.parquet(out2).count() < 50

    out3 = str(tmp_path / "shard_out")
    assert cli(["pipeline", "shard", "--in", src, "--out", out3,
                "--n-shards", "4"]) == 0
    sh = spark.read.parquet(out3)
    assert sh.count() == 50
    assert sh.select("shard").distinct().count() <= 4


def test_neardup_stream_matches_batch_randomized(spark, tmp_path):
    """Randomized differential: 3 seeded corpora with planted dup
    clusters; the stateful stream and the declarative twin must
    agree exactly on every one."""
    import json as _json
    import random

    from pyspark.sql import functions as F

    from cayley_spark.functions._cache import unpersist_intermediates
    from cayley_spark.streaming.neardup import (
        neardup_pairs_batch,
        neardup_pairs_stream,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau").split()
    for seed in (3, 17, 29):
        rng = random.Random(seed)
        rows = []
        for i in range(20):
            if i % 4 == 0 and i > 0:
                base = rows[i - 4][2]  # plant a near-dup of an earlier doc
                toks = base.split()
                toks[rng.randrange(len(toks))] = rng.choice(words)
                text = " ".join(toks)
            else:
                text = " ".join(rng.choice(words) for _ in range(10))
            rows.append((i, f"2024-01-01 00:{i:02d}:00", text))
        df = spark.createDataFrame(
            rows, "doc_id long, ts string, text string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = neardup_pairs_batch(df, threshold=0.5)
        batch = {(r["id_a"], r["id_b"], r["band"]) for r in out.collect()}
        unpersist_intermediates(out)

        src = tmp_path / f"rnd{seed}"
        src.mkdir()
        with open(src / "d.json", "w") as f:
            for did, ts, text in rows:
                f.write(_json.dumps(
                    {"doc_id": did, "ts": ts, "text": text}) + "\n")
        stream = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).json(str(src))
        q = (
            neardup_pairs_stream(stream, watermark="1 hour", threshold=0.5)
            .writeStream.format("memory")
            .queryName(f"rnd_out_{seed}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck{seed}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["id_a"], r["id_b"], r["band"])
            for r in spark.table(f"rnd_out_{seed}").collect()
        }
        assert got == batch, f"seed {seed}: {got ^ batch}"


def test_cli_pipeline_compact(spark, tmp_path, capsys):
    """pipeline compact: small-files maintenance — many tiny parquet
    files rewrite to few target-sized ones, rows preserved exactly."""
    from cayley_spark.__main__ import main

    src = str(tmp_path / "tiny.parquet")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    ).repartition(50).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 50
    out = str(tmp_path / "compacted")
    assert main(["pipeline", "compact", "--in", src, "--out", out,
                 "--target-mb", "512"]) == 0
    assert len(glob.glob(out + "/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 200


def test_url_dedup_stream_canonical_aliases(spark, tmp_path):
    """Streaming URL dedup keys on the CANONICAL form: aliased
    spellings (case, :80, tracking params, param order) arriving in
    later micro-batches are dropped; distinct resources survive;
    batch mode degrades to one row per canonical URL."""
    import json as _json
    import os as _os

    from cayley_spark.streaming.dedup import url_dedup_stream

    batches = [
        [(1, "2024-01-01 00:00:00", "http://a.com/x?b=2&a=1")],
        # same resource, three aliased spellings -> all dropped
        [(2, "2024-01-01 00:05:00", "HTTP://A.com:80/x?a=1&b=2"),
         (3, "2024-01-01 00:06:00", "http://a.com/x?utm_source=f&b=2&a=1")],
        # a genuinely different resource -> admitted
        [(4, "2024-01-01 00:10:00", "http://a.com/x?a=1&b=3")],
    ]
    src = tmp_path / "ud_in"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, ts, url in rows:
                f.write(_json.dumps(
                    {"doc_id": did, "ts": ts, "url": url}) + "\n")
        _os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    schema = "doc_id long, ts timestamp, url string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        url_dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("ud_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ud_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.sql("SELECT * FROM ud_out").collect()}
    assert kept == {1, 4}, kept
    # batch twin: one row per canonical key
    batch = spark.createDataFrame(
        [(1, "http://b.com/"), (2, "HTTP://B.com:80"), (3, "http://c.com/")],
        "doc_id long, url string",
    ).withColumn("ts", __import__("pyspark").sql.functions.current_timestamp())
    out = url_dedup_stream(batch).collect()
    assert len(out) == 2


def test_bloom_admission_stream_matches_batch_twin(spark, tmp_path):
    """Stateless bloom admission: rows whose content is in the
    historical bloom are dropped across micro-batches; genuinely new
    rows pass; the streaming output equals the batch twin on the
    same input (same pure expressions, no state)."""
    import json as _json
    import os as _os

    from cayley_spark.functions.bloom import bloom_build
    from cayley_spark.streaming.dedup import bloom_admission_stream
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(i, f"known-doc-{i}") for i in range(40)],
        "doc_id long, text string",
    )
    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    bloom = bloom_build(hist, key, n_bits=1 << 12, k=4)

    batches = [
        [(100, "2024-01-01 00:00:00", "known-doc-3"),
         (101, "2024-01-01 00:01:00", "fresh doc one")],
        [(102, "2024-01-01 00:05:00", "known-doc-17"),
         (103, "2024-01-01 00:06:00", "fresh doc two"),
         (104, "2024-01-01 00:07:00", None)],
    ]
    src = tmp_path / "ba_in"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for did, ts, text in rows:
                f.write(_json.dumps(
                    {"doc_id": did, "ts": ts, "text": text}) + "\n")
        _os.utime(src / f"b{i}.json", (1_700_000_000 + i * 60,) * 2)

    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        bloom_admission_stream(stream, bloom, n_bits=1 << 12, k=4)
        .writeStream.format("memory")
        .queryName("ba_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ba_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM ba_out").collect()
    }
    # known docs dropped (no false negatives); fresh + NULL admitted
    # (NULL keys as '' which is not in the historical corpus)
    assert got == {101, 103, 104}
    # batch twin over the union of all batches produces the same rows
    flat = spark.createDataFrame(
        [(d, t, x) for b in batches for d, t, x in b],
        "doc_id long, ts string, text string",
    )
    batch_got = {
        r["doc_id"]
        for r in bloom_admission_stream(
            flat, bloom, n_bits=1 << 12, k=4
        ).collect()
    }
    assert batch_got == got
