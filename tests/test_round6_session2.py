"""Round-6 second-session additions: Arrow-batched textkv data source
(covered in test_sources_sinks.py), the staged ZIP archive codec, and the
staged zlib compression-ratio quality signal."""

from __future__ import annotations

import pytest


def test_zip_synthesize_parse_roundtrip():
    """The ZIP path is a REAL archive codec: stdlib zipfile walks the
    central directory we wrote, CRC-verifies every member, and inflates
    member 0 back to the specified content."""
    from hadoopmapreduce_spark.operators.multimodal import (
        parse_zip_manifest,
        synthesize_zip,
    )

    payload = synthesize_zip(5, 20)  # doc_id=5 -> 3 members
    assert payload[:2] == b"PK"
    m = parse_zip_manifest(payload)
    prefix = len("doc5:")
    assert m["n_members"] == 3
    assert m["names"] == "m0.txt,m1.txt,m2.txt"
    assert m["total_uncompressed"] == 3 * (prefix + 20) + 7 * 3  # +7*(0+1+2)
    assert m["head0"] == ("doc5:" + "x" * 20)[:12]


def test_zip_payload_bytes_deterministic():
    """Fixed ZipInfo timestamps make the payload run-independent — the
    same (doc_id, base_len) must produce identical bytes."""
    from hadoopmapreduce_spark.operators.multimodal import synthesize_zip

    assert synthesize_zip(42, 33) == synthesize_zip(42, 33)


def test_zip_parser_rejects_corrupted_member():
    """Proof the parser decompresses, not pattern-matches: corrupting
    bytes inside a DEFLATED member's stream makes CRC verification
    raise."""
    from hadoopmapreduce_spark.operators.multimodal import (
        parse_zip_manifest,
        synthesize_zip,
    )

    payload = bytearray(synthesize_zip(7, 40))
    # member 0 (DEFLATED) local header starts at 0; its data begins after
    # the 30-byte local header + name.  Flip bytes there.
    data_off = 30 + len("m0.txt")
    payload[data_off + 2] ^= 0xFF
    payload[data_off + 3] ^= 0xFF
    with pytest.raises(Exception):
        parse_zip_manifest(bytes(payload))


def test_zip_parser_rejects_truncated_archive():
    from hadoopmapreduce_spark.operators.multimodal import (
        parse_zip_manifest,
        synthesize_zip,
    )

    payload = synthesize_zip(3, 25)
    with pytest.raises(Exception):
        parse_zip_manifest(payload[: len(payload) // 2])


def test_zip_manifest_features_end_to_end(spark, sf_dir, oracle_con):
    """Synthesize -> mapInPandas parse over the fixture, then hash-match
    the pre-staged round-7 oracle (closed-form member sizes in DuckDB)."""
    from hadoopmapreduce_spark.operators.multimodal import (
        ZIP_ARCHIVE_ORACLE_SQL,
        zip_manifest_features,
    )
    from hadoopmapreduce_spark.oracle import compare

    df = zip_manifest_features(spark, sf_dir)
    report = compare("zip_manifest_features", df, oracle_con, ZIP_ARCHIVE_ORACLE_SQL)
    assert report.ok and report.exact_values, report.detail


def test_zip_mixed_compression_types():
    """Members alternate DEFLATED/STORED — both code paths are present in
    every multi-member archive (the parser must handle each)."""
    import io
    import zipfile

    from hadoopmapreduce_spark.operators.multimodal import synthesize_zip

    with zipfile.ZipFile(io.BytesIO(synthesize_zip(5, 10))) as zf:
        kinds = [i.compress_type for i in zf.infolist()]
    assert kinds == [zipfile.ZIP_DEFLATED, zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED]


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    """Every (n_bytes, n_deflate) must equal a direct driver-side zlib
    recomputation on the same fixture rows — the exactness evidence that
    stands in for a SQL oracle (DEFLATE is not SQL-expressible)."""
    import zlib

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.textops import (
        DEFLATE_LEVEL,
        text_compression_ratio,
    )

    got = {r.doc_id: r for r in text_compression_ratio(spark, sf_dir).collect()}
    src = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(src) > 0
    for s in src:
        raw = s.text.encode("utf-8")
        r = got[s.doc_id]
        assert r.n_bytes == len(raw)
        assert r.n_deflate == len(zlib.compress(raw, DEFLATE_LEVEL))
        assert r.deflate_ppm == 1_000_000 * r.n_deflate // max(r.n_bytes, 1)
        assert r.keep == (1 if 300_000 <= r.deflate_ppm < 1_050_000 else 0)


def test_compression_ratio_partitioning_invariant(spark, sf_dir):
    """The signal is per-row: shrinking spark.sql.files.maxPartitionBytes
    changes the SCAN partitioning (the input the zlib UDF actually sees,
    unlike a post-hoc repartition of the output), and the sorted result
    set must not move."""
    from hadoopmapreduce_spark.operators.textops import text_compression_ratio

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        base = sorted(
            tuple(r) for r in text_compression_ratio(spark, sf_dir).collect()
        )
        for size in ("4096", "65536"):
            spark.conf.set(key, size)
            df = text_compression_ratio(spark, sf_dir)
            assert df.rdd.getNumPartitions() >= 1
            assert sorted(tuple(r) for r in df.collect()) == base, size
    finally:
        spark.conf.set(key, old)


def test_compression_ratio_monotone_property():
    """Repetitive text must compress strictly better than high-entropy
    text of the same length — the discriminating property the quality
    gate relies on."""
    import random
    import zlib

    from hadoopmapreduce_spark.operators.textops import DEFLATE_LEVEL

    rng = random.Random(7)
    n = 4000
    repetitive = ("the quick brown fox " * 400)[:n].encode()
    noisy = "".join(chr(rng.randrange(33, 127)) for _ in range(n)).encode()
    rep_ppm = 1_000_000 * len(zlib.compress(repetitive, DEFLATE_LEVEL)) // n
    noise_ppm = 1_000_000 * len(zlib.compress(noisy, DEFLATE_LEVEL)) // n
    assert rep_ppm < 300_000 < noise_ppm


def test_textkv_byte_range_splits_exactly_once(spark, tmp_path):
    """Byte-range splitting must read every line exactly once regardless
    of where boundaries land: tiny split_bytes forces boundaries mid-line,
    exactly at line starts, and at EOF."""
    d = tmp_path / "kvsplit"
    d.mkdir()
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    n = 500
    with open(d / "part-00000", "w", encoding="utf-8") as fh:
        for i in range(n):
            fh.write(f"key{i}\t{i}\n")
    unsplit = sorted(
        (r.key, r.value)
        for r in spark.read.format("textkv")
        .option("split_bytes", 1 << 30)
        .load(str(d))
        .collect()
    )
    assert len(unsplit) == n
    # split_bytes=1 (one partition per byte) is covered at reader level by
    # the property test below — running it through Spark means thousands
    # of tasks for no extra coverage
    for split in (64, 1000):
        df = (
            spark.read.format("textkv")
            .option("split_bytes", split)
            .load(str(d))
        )
        got = sorted((r.key, r.value) for r in df.collect())
        assert got == unsplit, f"split_bytes={split} lost or duplicated lines"
    # a small split really does fan out into many partitions
    fanned = (
        spark.read.format("textkv").option("split_bytes", 64).load(str(d))
    )
    assert fanned.rdd.getNumPartitions() > 10


def test_textkv_split_boundary_property(tmp_path):
    """Property: for random line lengths (including empty lines and
    multibyte chars) and a random split size, the split read equals the
    unsplit read.  Plain-Python harness over the reader itself — no Spark
    job per example."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoopmapreduce_spark.sources.textkv_source import TextKVReader

    class _Opts(dict):
        pass

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        lines = data.draw(
            st.lists(
                st.tuples(
                    st.text(
                        alphabet="abcüß日", min_size=0, max_size=8
                    ).filter(lambda s: "\t" not in s and "\n" not in s),
                    st.text(
                        alphabet="xyz0é", min_size=0, max_size=8
                    ).filter(lambda s: "\n" not in s),
                ),
                min_size=0,
                max_size=30,
            )
        )
        p = tmp_path / f"prop-{data.draw(st.integers(0, 10**9))}"
        p.mkdir(exist_ok=True)
        f = p / "part-00000"
        with open(f, "w", encoding="utf-8") as fh:
            for k, v in lines:
                fh.write(f"{k}\t{v}\n")
        split = data.draw(st.integers(1, 40))
        expected = [
            (k, v) for k, v in lines if f"{k}\t{v}"  # blank lines skipped
        ]
        reader = TextKVReader(_Opts(path=str(p), split_bytes=split))
        got = []
        for part in reader.partitions():
            for batch in reader.read(part):
                got.extend(
                    zip(
                        batch.column(0).to_pylist(),
                        batch.column(1).to_pylist(),
                    )
                )
        assert got == expected  # order within one file is preserved too

    run()


def test_textkv_stream_writer_end_to_end(spark, sf_dir, tmp_path):
    """The streaming textkv sink: replay the events table as micro-batches
    through the custom streaming reader, terminate the stream in the
    custom streaming writer, and the committed directory must (a) read
    back through the BATCH textkv reader with exactly the batch-computed
    rows and (b) carry per-epoch part files from more than one epoch."""
    import os

    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.sources.event_replay_source import (
        EventReplayDataSource,
    )
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    spark.dataSource.register(EventReplayDataSource)
    register_textkv(spark)
    path = os.path.join(sf_dir, "events.parquet")
    out = str(tmp_path / "stream_out")
    os.makedirs(out, exist_ok=True)

    src = (
        spark.readStream.format("event_replay")
        .option("path", path)
        .option("chunks", "4")
        .load()
    )
    kv = src.select(
        F.col("event_type").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    q = (
        kv.writeStream.format("textkv")
        .option("checkpointLocation", str(tmp_path / "_ckpt"))
        .start(out)
    )
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.key, r.value)
        for r in spark.read.format("textkv").load(out).collect()
    )
    expected = sorted(
        (r.key, r.value)
        for r in spark.read.parquet(path)
        .select(
            F.col("event_type").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
        .collect()
    )
    assert got == expected and len(got) > 0

    epochs = {
        f.split("-")[1] for f in os.listdir(out) if f.startswith("part-")
    }
    assert len(epochs) > 1, f"expected multi-epoch output, got {epochs}"
    assert not [f for f in os.listdir(out) if f.startswith("_stream-staging")]


def test_textkv_stream_commit_replay_replaces_epoch(tmp_path):
    """Epoch replay idempotence, driver-side unit: committing the same
    batchId twice (second time with a different task count) must leave
    exactly the second commit's files — no duplicates, no strays."""
    from hadoopmapreduce_spark.sources.textkv_source import (
        TextKVCommit,
        TextKVStreamWriter,
    )

    out = tmp_path / "replay"
    out.mkdir()
    w = TextKVStreamWriter({"path": str(out)})

    def stage(contents):
        import os

        os.makedirs(w.staging, exist_ok=True)
        msgs = []
        for i, c in enumerate(contents):
            p = os.path.join(w.staging, f"task-{i:05d}-attempt-{i}")
            with open(p, "w") as fh:
                fh.write(c)
            msgs.append(TextKVCommit(staged=p, rows=1))
        return msgs

    w.commit(stage(["a\t1\n", "b\t2\n", "c\t3\n"]), batchId=7)
    assert sorted(f.name for f in out.iterdir()) == [
        "part-000000007-00000",
        "part-000000007-00001",
        "part-000000007-00002",
    ]
    # replayed epoch 7 with 2 tasks replaces all 3 prior files
    w.commit(stage(["x\t9\n", "y\t8\n"]), batchId=7)
    names = sorted(f.name for f in out.iterdir())
    assert names == ["part-000000007-00000", "part-000000007-00001"]
    data = sorted((out / n).read_text() for n in names)
    assert data == ["x\t9\n", "y\t8\n"]


def test_streaming_textkv_sink_roundtrip_oracle(spark, sf_dir, oracle_con):
    """The staged round-7 query: multi-epoch stream through the textkv
    streaming sink, re-read and re-aggregated — must hash-match the plain
    batch SQL over events (integer-ppm values make the text boundary
    exact)."""
    from hadoopmapreduce_spark.oracle import compare
    from hadoopmapreduce_spark.streaming.windowed import (
        TEXTKV_STREAM_SINK_ORACLE_SQL,
        streaming_textkv_sink_roundtrip,
    )

    df = streaming_textkv_sink_roundtrip(spark, sf_dir)
    report = compare(
        "streaming_textkv_sink_roundtrip",
        df,
        oracle_con,
        TEXTKV_STREAM_SINK_ORACLE_SQL,
    )
    assert report.ok and report.exact_values, report.detail


def test_textkv_filter_pushdown_reader_level(tmp_path):
    """pushFilters contract, reader-level: supported string predicates are
    absorbed (and actually applied in read); unsupported ones come back
    for Spark to evaluate."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        StringStartsWith,
    )

    from hadoopmapreduce_spark.sources.textkv_source import (
        TextKVPushdownReader,
    )

    d = tmp_path / "kvpush"
    d.mkdir()
    (d / "part-00000").write_text("apple\t1\navocado\t2\nbanana\t3\n")
    reader = TextKVPushdownReader({"path": str(d)})
    remaining = list(
        reader.pushFilters(
            [
                StringStartsWith(("key",), "a"),
                GreaterThan(("value",), "1"),  # range predicates stay with Spark
            ]
        )
    )
    assert [type(f).__name__ for f in remaining] == ["GreaterThan"]
    rows = []
    for part in reader.partitions():
        for batch in reader.read(part):
            rows.extend(zip(batch.column(0).to_pylist(), batch.column(1).to_pylist()))
    assert rows == [("apple", "1"), ("avocado", "2")]

    # EqualTo on value, non-string literal must NOT be absorbed
    r2 = TextKVPushdownReader({"path": str(d)})
    rem2 = list(r2.pushFilters([EqualTo(("value",), 1)]))
    assert [type(f).__name__ for f in rem2] == ["EqualTo"]

    # In / EndsWith / Contains all absorb and apply
    from pyspark.sql.datasource import In, StringContains, StringEndsWith

    r3 = TextKVPushdownReader({"path": str(d)})
    assert list(
        r3.pushFilters(
            [
                In(("key",), ("apple", "banana")),
                StringEndsWith(("key",), "e"),
                StringContains(("value",), "1"),
            ]
        )
    ) == []
    rows3 = []
    for part in r3.partitions():
        for batch in r3.read(part):
            rows3.extend(
                zip(batch.column(0).to_pylist(), batch.column(1).to_pylist())
            )
    assert rows3 == [("apple", "1")]


def test_textkv_filter_pushdown_through_spark(spark, tmp_path):
    """End-to-end: a filtered read returns exactly the rows a post-scan
    filter would, and the scan's plan carries the pushed filter (the rows
    were dropped source-side)."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    d = tmp_path / "kvpushspark"
    d.mkdir()
    with open(d / "part-00000", "w") as fh:
        for i in range(1000):
            fh.write(f"user{i % 7}\t{i}\n")
    df = spark.read.format("textkv").load(str(d))
    got = sorted(
        (r.key, r.value) for r in df.filter(F.col("key") == "user3").collect()
    )
    expected = sorted(
        (f"user{i % 7}", str(i)) for i in range(1000) if i % 7 == 3
    )
    assert got == expected
    # fully-absorbed predicate: the post-scan Filter node disappears from
    # the optimized plan (the source takes responsibility for it)
    pushed_plan = (
        df.filter(F.col("key") == "user3")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Filter" not in pushed_plan, pushed_plan
    # a range predicate is handed back: the Filter node must survive
    kept_plan = (
        df.filter(F.col("value") > "500")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Filter" in kept_plan, kept_plan
    got_range = sorted(
        (r.key, r.value) for r in df.filter(F.col("value") > "500").collect()
    )
    exp_range = sorted(
        (f"user{i % 7}", str(i)) for i in range(1000) if str(i) > "500"
    )
    assert got_range == exp_range
    # isin() plans as an In filter — absorbed and correct through Spark
    got_in = sorted(
        (r.key, r.value)
        for r in df.filter(F.col("key").isin("user1", "user5")).collect()
    )
    exp_in = sorted(
        (f"user{i % 7}", str(i)) for i in range(1000) if i % 7 in (1, 5)
    )
    assert got_in == exp_in


def test_textkv_batch_append_mode_preserves_prior_output(spark, tmp_path):
    """Append mode must number new part files AFTER the existing ones —
    renaming from part-00000 would clobber previously committed rows."""
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    out = str(tmp_path / "kvappend")
    first = spark.createDataFrame(
        [("a", "1"), ("b", "2")], "key string, value string"
    ).coalesce(1)
    first.write.format("textkv").mode("overwrite").save(out)
    second = spark.createDataFrame(
        [("c", "3")], "key string, value string"
    ).coalesce(1)
    second.write.format("textkv").mode("append").save(out)
    back = sorted(
        (r.key, r.value)
        for r in spark.read.format("textkv").load(out).collect()
    )
    assert back == [("a", "1"), ("b", "2"), ("c", "3")]


def test_textkv_writer_rejects_nested_types(spark, tmp_path):
    """Nested (key,value) column types fail at PLANNING time with a clear
    message instead of an Arrow cast error mid-job."""
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    df = spark.createDataFrame(
        [("k", ["a", "b"])], "key string, value array<string>"
    )
    with pytest.raises(Exception, match="atomic"):
        df.write.format("textkv").mode("overwrite").save(
            str(tmp_path / "kvnested")
        )


def test_textkv_stream_truncate_mode_keeps_only_latest_snapshot(tmp_path):
    """overwrite=True (Spark's complete-output-mode signal) makes each
    epoch a full snapshot: commit replaces ALL prior part files."""
    from hadoopmapreduce_spark.sources.textkv_source import (
        TextKVCommit,
        TextKVStreamWriter,
    )

    out = tmp_path / "trunc"
    out.mkdir()
    w = TextKVStreamWriter({"path": str(out)}, overwrite=True)

    def stage(contents):
        import os

        os.makedirs(w.staging, exist_ok=True)
        msgs = []
        for i, c in enumerate(contents):
            p = os.path.join(w.staging, f"task-{i:05d}-attempt-{i}")
            with open(p, "w") as fh:
                fh.write(c)
            msgs.append(TextKVCommit(staged=p, rows=1))
        return msgs

    w.commit(stage(["a\t1\n", "b\t1\n"]), batchId=0)
    w.commit(stage(["a\t2\n"]), batchId=1)
    names = sorted(f.name for f in out.iterdir())
    assert names == ["part-000000001-00000"], names
    assert (out / names[0]).read_text() == "a\t2\n"


def test_textkv_stream_commit_gcs_stale_staging_dirs(tmp_path):
    """Staging dirs leaked by a CRASHED earlier run are garbage-collected
    at the next commit (epochs are sequential, so anything present at
    commit time is dead)."""
    from hadoopmapreduce_spark.sources.textkv_source import (
        TextKVCommit,
        TextKVStreamWriter,
    )

    out = tmp_path / "gc"
    out.mkdir()
    stale = out / "_stream-staging-deadbeef"
    stale.mkdir()
    (stale / "task-00000-attempt-0").write_text("orphan\t0\n")
    w = TextKVStreamWriter({"path": str(out)})
    import os

    os.makedirs(w.staging, exist_ok=True)
    p = os.path.join(w.staging, "task-00000-attempt-1")
    with open(p, "w") as fh:
        fh.write("live\t1\n")
    w.commit([TextKVCommit(staged=p, rows=1)], batchId=0)
    leftovers = [f.name for f in out.iterdir() if f.name.startswith("_stream")]
    assert leftovers == []
    assert (out / "part-000000000-00000").read_text() == "live\t1\n"


def test_textkv_pushdown_opt_out_option(spark, tmp_path):
    """.option('pushdown', 'false') selects the base reader (no
    pushFilters), so the read plans even when the gating conf is off and
    the post-scan Filter survives in the plan."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    d = tmp_path / "kvoptout"
    d.mkdir()
    (d / "part-00000").write_text("a\t1\nb\t2\n")
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled")
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        df = (
            spark.read.format("textkv")
            .option("pushdown", "false")
            .load(str(d))
            .filter(F.col("key") == "a")
        )
        assert [(r.key, r.value) for r in df.collect()] == [("a", "1")]
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Filter" in plan
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
