"""Round-14 OPTIMIZATION-round pins.

Covers the catalog-level hardening this round added: the scratch routing
rule (tmpfs only when free space covers the request — VERDICT r13 ask #6),
the schema-cache invalidation signature (ADVICE r13), byte-size suffix
parsing (ADVICE r13), and the row-group-aware spread estimate.
"""

from __future__ import annotations

import os

SF_SMALL = "/root/testdata/sf0.001"


def test_scratch_routing_by_need(monkeypatch):
    """scratch_base: metadata-sized requests may land on /dev/shm; a
    request larger than shm's free space must fall back to the disk
    tempdir; $SPARK_GRAFT_SCRATCH overrides unconditionally."""
    import tempfile

    from hadoopmapreduce_spark import catalog

    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    small = catalog.scratch_base()
    assert small in ("/dev/shm", tempfile.gettempdir())
    # a request no host can satisfy must route to disk
    assert catalog.scratch_base(need_bytes=1 << 62) == tempfile.gettempdir()
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", "/opt/fastdisk")
    assert catalog.scratch_base(need_bytes=1 << 62) == "/opt/fastdisk"


def test_work_dir_sizes_request_from_fixture(monkeypatch, tmp_path):
    """work_dir passes a dataset-derived need to scratch_base (sink
    round-trips write up to dataset-sized output)."""
    from hadoopmapreduce_spark import catalog

    seen = {}
    real = catalog.scratch_base

    def spy(need_bytes=0):
        seen["need"] = need_bytes
        return str(tmp_path)

    monkeypatch.setattr(catalog, "scratch_base", spy)
    try:
        catalog.work_dir("pin_probe", SF_SMALL)
    finally:
        catalog.scratch_base = real
    assert seen["need"] >= catalog._dir_bytes(SF_SMALL) > 0


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    """Regenerating a table at the same path with a different schema must
    MISS the schema cache (ADVICE r13: a stale explicit schema silently
    nulls renamed columns)."""
    import shutil
    import time

    from hadoopmapreduce_spark import catalog

    d = tmp_path / "sfX"
    d.mkdir()
    src = os.path.join(SF_SMALL, "documents.parquet")
    dst = str(d / "documents.parquet")
    shutil.copyfile(src, dst)
    first = catalog.load_table(spark, str(d), "documents").schema
    # rewrite with a different schema at the same path
    spark.range(5).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS brand_new_col"
    ).write.mode("overwrite").parquet(dst)
    # ensure mtime_ns actually moved even on coarse filesystems
    t = time.time() + 2
    os.utime(dst, (t, t))
    second = catalog.load_table(spark, str(d), "documents").schema
    assert first != second
    assert "brand_new_col" in second.fieldNames()


def test_size_bytes_two_letter_suffixes():
    from hadoopmapreduce_spark.catalog import _size_bytes

    assert _size_bytes("128m") == _size_bytes("128mb") == 128 << 20
    assert _size_bytes("1g") == _size_bytes("1gb") == 1 << 30
    assert _size_bytes("2kb") == 2048
    assert _size_bytes("134217728b") == 134217728
    assert _size_bytes("512") == 512


def test_row_groups_cached_and_exact(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoopmapreduce_spark.catalog import _row_groups

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": list(range(1000))}), p, row_group_size=100)
    assert _row_groups(p) == 10
    # unreadable path -> unbounded sentinel (byte estimate stands alone)
    assert _row_groups(str(tmp_path / "missing.parquet")) >= 1 << 20
