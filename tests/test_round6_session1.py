"""Round-6 session tests: edges of the pmi_top_pairs rewrite (the round's
one production-code change — VERDICT r5 ask #2)."""

from __future__ import annotations


def test_pmi_rank_empty_input_keeps_schema(spark, sf_dir):
    """An empty top slice (e.g. min-count prunes everything at a tiny SF)
    must still return the full 5-column schema so the driver's schema
    check cannot flip on degenerate inputs."""
    from hadoopmapreduce_spark.operators.textops import _pmi_rank, _pmi_scored_top

    top = _pmi_scored_top(spark, sf_dir)
    empty = _pmi_rank(spark, top.limit(0))
    assert empty.columns == ["w1", "w2", "c_xy", "assoc", "rk"]
    assert empty.count() == 0
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "string", "string", "bigint", "double", "int"
    ]


def test_pmi_rank_matches_legacy_window_semantics(spark, sf_dir):
    """The orderBy+limit+enumerate rewrite must reproduce the original
    row_number()-over-global-Window results exactly (same rows, same
    ranks, bit-identical assoc doubles)."""
    from pyspark.sql import Window, functions as F

    from hadoopmapreduce_spark.operators.textops import (
        PMI_TOP_N,
        _pmi_scored_top,
        pmi_top_pairs,
    )

    new = pmi_top_pairs(spark, sf_dir).collect()
    # legacy plan, reconstructed from the pre-rewrite implementation
    scored = _pmi_scored_top(spark, sf_dir)  # already limited; undo nothing —
    # the scored set below the cut is what both plans rank identically
    w = Window.orderBy(F.desc("assoc"), F.asc("w1"), F.asc("w2"))
    legacy = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PMI_TOP_N)
        .collect()
    )
    assert [tuple(r) for r in new] == [tuple(r) for r in legacy]


def test_wav_synthesize_decode_roundtrip():
    """The WAV path is a REAL codec: stdlib wave parses the RIFF container
    we wrote and the exact-integer features come out as specified."""
    from hadoopmapreduce_spark.operators.multimodal import (
        WAV_FRAMERATE,
        decode_wav_features,
        synthesize_wav,
    )

    payload = synthesize_wav(100, 3000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    feats = decode_wav_features(payload)
    assert feats == {
        "n_channels": 1,
        "sampwidth": 2,
        "framerate": WAV_FRAMERATE,
        "n_frames": 100,
        "peak": 3000,
        "rms": 3000,
    }


def test_wav_decoder_rejects_tampered_header():
    """Proof the decoder is a parser, not arithmetic: corrupting the format
    chunk makes the codec raise instead of emitting garbage features."""
    import pytest

    from hadoopmapreduce_spark.operators.multimodal import (
        decode_wav_features,
        synthesize_wav,
    )

    payload = bytearray(synthesize_wav(50, 1000))
    payload[8:12] = b"XXXX"  # break the WAVE magic
    with pytest.raises(Exception):
        decode_wav_features(bytes(payload))


def test_audio_decode_features_end_to_end(spark, sf_dir):
    """Synthesize → parquet-typed binary column → mapInPandas decode:
    every decoded row must match the features predictable from
    (doc_id, text) alone — the oracle contract the round-7 registration
    will rely on."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.multimodal import (
        WAV_FRAMERATE,
        audio_decode_features,
    )

    got = {r.doc_id: r for r in audio_decode_features(spark, sf_dir).collect()}
    exp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.length(F.encode(F.col("text"), "utf-8")) % 400 + 10).alias("n_frames"),
        ((F.col("doc_id") % 7 + 1) * 1000).alias("amp"),
    ).collect()
    assert len(got) == len(exp) > 0
    for e in exp:
        r = got[e.doc_id]
        assert (r.n_channels, r.sampwidth, r.framerate) == (1, 2, WAV_FRAMERATE)
        assert r.n_frames == e.n_frames
        assert r.peak == e.amp and r.rms == e.amp


def test_wav_binaryfile_source_ingest(spark, tmp_path):
    """The production ingest shape for multimodal blobs: real WAV files on
    disk, read through Spark's built-in ``binaryFile`` source (path,
    modificationTime, length, content), decoded by the real codec.  No
    custom reader — the content column IS the payload column convention."""
    import os

    from hadoopmapreduce_spark.operators.multimodal import (
        _audio_decode_batch,
        _AUDIO_SCHEMA,
        synthesize_wav,
    )

    specs = {1: (50, 2000), 2: (123, 5000), 3: (400, 7000)}
    for doc_id, (n, a) in specs.items():
        (tmp_path / f"{doc_id}.wav").write_bytes(synthesize_wav(n, a))

    from pyspark.sql import functions as F

    ingested = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(str(tmp_path))
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.wav$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("content").alias("payload"),
            "length",
        )
    )
    # binaryFile's own metadata must agree with the bytes we wrote
    for r in ingested.select("doc_id", "length").collect():
        assert r.length == os.path.getsize(tmp_path / f"{r.doc_id}.wav")
    decoded = {
        r.doc_id: r
        for r in ingested.select("doc_id", "payload")
        .mapInPandas(_audio_decode_batch, schema=_AUDIO_SCHEMA)
        .collect()
    }
    assert set(decoded) == set(specs)
    for doc_id, (n, a) in specs.items():
        r = decoded[doc_id]
        assert (r.n_frames, r.peak, r.rms) == (n, a, a)


def test_audio_decode_oracle_parity(spark, sf_dir, oracle_con):
    """The pre-staged round-7 oracle must already hash-match the real
    decode pipeline — registration later is then a pure wiring change."""
    from hadoopmapreduce_spark.operators.multimodal import (
        AUDIO_DECODE_ORACLE_SQL,
        audio_decode_features,
    )
    from hadoopmapreduce_spark.oracle import compare

    df = audio_decode_features(spark, sf_dir)
    report = compare("audio_decode_features", df, oracle_con, AUDIO_DECODE_ORACLE_SQL)
    assert report.ok and report.exact_values, report.detail


def test_png_synthesize_decode_roundtrip():
    """The PNG path is a real codec: the synthesized file is standards-
    valid and the decoded pixel statistics equal the closed form."""
    from hadoopmapreduce_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png,
    )

    w, h, seed = 13, 7, 200
    feats = decode_png_features(synthesize_png(w, h, seed))
    exp_pixels = [(x + y + seed) % 256 for y in range(h) for x in range(w)]
    assert feats == {
        "width": w,
        "height": h,
        "bit_depth": 8,
        "color_type": 0,
        "n_pixels": w * h,
        "sum_pixels": sum(exp_pixels),
        "max_pixel": max(exp_pixels),
    }


def test_png_decoder_reconstructs_all_filter_types():
    """Spec-completeness of the unfilterer: encode the same raw image with
    each scanline filter type (Sub/Up/Average/Paeth, per RFC 2083's
    encode direction) and require bit-identical reconstruction."""
    import struct
    import zlib

    from hadoopmapreduce_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png_features,
    )

    w, h = 9, 5
    raw = [[(3 * x * x + 7 * y + 11) % 256 for x in range(w)] for y in range(h)]

    def encode(ftype: int) -> bytes:
        lines = bytearray()
        prev = [0] * w
        for y in range(h):
            line = raw[y]
            lines.append(ftype)
            for i in range(w):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                lines.append((line[i] - pred) & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b"")
        )

    flat = [v for row in raw for v in row]
    expected_sum, expected_max = sum(flat), max(flat)
    for ftype in range(5):
        feats = decode_png_features(encode(ftype))
        assert (feats["sum_pixels"], feats["max_pixel"]) == (
            expected_sum,
            expected_max,
        ), f"filter type {ftype} mis-reconstructed"


def test_png_decoder_rejects_corrupt_crc():
    import pytest

    from hadoopmapreduce_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png,
    )

    payload = bytearray(synthesize_png(8, 8, 1))
    payload[20] ^= 0xFF  # flip a byte inside IHDR data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png_features(bytes(payload))


def test_image_decode_features_end_to_end(spark, sf_dir, oracle_con):
    """Synthesize -> mapInPandas decode over the fixture, then hash-match
    the pre-staged round-7 oracle (which recomputes the pixel statistics
    by cross-unnesting the pixel ranges in DuckDB)."""
    from hadoopmapreduce_spark.operators.multimodal import (
        IMAGE_DECODE_ORACLE_SQL,
        image_decode_features,
    )
    from hadoopmapreduce_spark.oracle import compare

    df = image_decode_features(spark, sf_dir)
    report = compare("image_decode_features", df, oracle_con, IMAGE_DECODE_ORACLE_SQL)
    assert report.ok and report.exact_values, report.detail


def test_png_unfilter_property_random_images():
    """Property test: for random pixel content and per-scanline-random
    filter choices (the shape real encoders emit), encode→decode must be
    the identity on the raw pixels."""
    import struct
    import zlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoopmapreduce_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png_features,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        w = data.draw(st.integers(1, 24))
        h = data.draw(st.integers(1, 12))
        raw = [
            [data.draw(st.integers(0, 255)) for _ in range(w)] for _ in range(h)
        ]
        ftypes = [data.draw(st.integers(0, 4)) for _ in range(h)]
        lines = bytearray()
        prev = [0] * w
        for y in range(h):
            line, ftype = raw[y], ftypes[y]
            lines.append(ftype)
            for i in range(w):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                lines.append((line[i] - pred) & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        png = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b"")
        )
        feats = decode_png_features(png)
        flat = [v for row in raw for v in row]
        assert feats["sum_pixels"] == sum(flat)
        assert feats["max_pixel"] == max(flat)
        assert feats["n_pixels"] == w * h

    run()


def test_mp4_synthesize_parse_roundtrip():
    """The MP4 path is a real container parser: spec-layout boxes round-trip
    and the extracted metadata equals the synthesis spec."""
    from hadoopmapreduce_spark.operators.multimodal import (
        MP4_TIMESCALE,
        parse_mp4_features,
        synthesize_mp4,
    )

    feats = parse_mp4_features(synthesize_mp4(1234, 320, 180, 77))
    assert feats == {
        "brand": "isom",
        "timescale": MP4_TIMESCALE,
        "duration": 1234,
        "n_tracks": 1,
        "width": 320,
        "height": 180,
        "mdat_bytes": 77,
    }


def test_mp4_parser_rejects_truncation_and_overflow():
    """Strict size accounting: a truncated file and a box whose declared
    size overflows its parent must both raise, not mis-parse."""
    import pytest

    from hadoopmapreduce_spark.operators.multimodal import (
        parse_mp4_features,
        synthesize_mp4,
    )

    good = synthesize_mp4(10, 160, 90, 5)
    with pytest.raises(ValueError):
        parse_mp4_features(good[:-3])  # truncated mid-box
    evil = bytearray(good)
    evil[0:4] = (2**31).to_bytes(4, "big")  # ftyp size overflows the file
    with pytest.raises(ValueError, match="overflows"):
        parse_mp4_features(bytes(evil))


def test_video_probe_features_oracle_parity(spark, sf_dir, oracle_con):
    from hadoopmapreduce_spark.operators.multimodal import (
        VIDEO_PROBE_ORACLE_SQL,
        video_probe_features,
    )
    from hadoopmapreduce_spark.oracle import compare

    report = compare(
        "video_probe_features",
        video_probe_features(spark, sf_dir),
        oracle_con,
        VIDEO_PROBE_ORACLE_SQL,
    )
    assert report.ok and report.exact_values, report.detail
