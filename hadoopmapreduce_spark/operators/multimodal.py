"""[EXT] Multimodal column support: opaque binary payloads + typed metadata.

Convention (SURVEY.md §1.2): a multimodal asset is a ``binary`` payload
column plus scalar/struct metadata columns — parquet stores the blob inline
(size-capped row groups at scale), Catalyst prunes it away for
metadata-only queries, and Arrow carries it zero-copy into Python when a
decoder actually runs.

The real decode step (image/audio codecs) is STUBBED — the libs aren't in
this container; see ``decode_image_stub``.  What is real and tested: the
schema convention, the binary round-trip, the ``mapInPandas`` batch
plumbing (Arrow-chunked iterator, metadata-derived features), and the
frame-sampling explode.  A deterministic fake decoder keeps the pipeline
end-to-end verifiable against a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query

_KINDS = ("image", "audio", "video")


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for a real image decode (PIL/libvips not in container).

    At deployment this becomes `PIL.Image.open(io.BytesIO(payload))` inside
    the same mapInPandas batch loop used by mm_decode_features — the Spark
    plumbing does not change, only this function body.
    """
    raise NotImplementedError(
        "real image decoding requires PIL/libvips; not available in this "
        "environment — mm_decode_features uses a deterministic fake decoder"
    )


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize multimodal assets from documents: payload = utf-8 bytes of
    the text (an opaque blob as far as the pipeline is concerned), kind
    assigned round-robin, metadata struct alongside."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@query(
    "mm_payload_stats",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                        ELSE 'video' END AS kind,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY 1
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over multimodal assets.  Catalyst prunes the
    payload column out of the scan entirely (ReadSchema excludes the blob) —
    the query costs the same as if the binary column didn't exist, which is
    the point of the payload/metadata split at 100 TB."""
    assets = _assets(spark, sf_dir)
    return assets.groupBy(F.col("meta.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes").cast("bigint")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes").cast("bigint")).alias("max_bytes"),
    )


_DECODE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, width int, height int, "
    "n_frames int, aspect double"
)


def _fake_decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder over Arrow batches: derives pseudo
    width/height/frame-count from payload length.  Swap the body for a real
    codec (see decode_image_stub) without touching the Spark plan."""
    for pdf in it:
        n_bytes = pdf["payload"].map(len).astype("int32")
        width = (n_bytes % 64 + 16).astype("int32")
        height = (n_bytes // 64 % 64 + 16).astype("int32")
        n_frames = pd.Series(1, index=pdf.index, dtype="int32").where(
            pdf["kind"] != "video", (n_bytes % 30 + 1).astype("int32")
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "width": width,
                "height": height,
                "n_frames": n_frames,
                "aspect": width.astype("float64") / height.astype("float64"),
            }
        )


@query(
    "mm_decode_features",
    oracle="""
    WITH a AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                          ELSE 'video' END AS kind,
             octet_length(encode(text)) AS n_bytes
      FROM documents)
    SELECT doc_id, kind, CAST(n_bytes AS INT) AS n_bytes,
           CAST(n_bytes % 64 + 16 AS INT) AS width,
           CAST((n_bytes // 64) % 64 + 16 AS INT) AS height,
           CAST(CASE WHEN kind = 'video' THEN n_bytes % 30 + 1 ELSE 1 END AS INT) AS n_frames,
           CAST(n_bytes % 64 + 16 AS DOUBLE) / CAST((n_bytes // 64) % 64 + 16 AS DOUBLE) AS aspect
    FROM a
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract through ``mapInPandas``: binary payloads cross
    into Python as Arrow batches, the (fake) decoder emits typed features.
    This is the real plumbing a production decoder uses — partition-sized
    batch iteration, no per-row serialization, schema declared up front.
    The fake decode is arithmetic on byte length, so the whole pipeline
    stays SQL-oracle-checkable."""
    assets = _assets(spark, sf_dir).select(
        "doc_id", F.col("meta.kind").alias("kind"), "payload"
    )
    return assets.mapInPandas(_fake_decode_batch, schema=_DECODE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) % 30 + 1 AS n_frames
      FROM documents WHERE CAST(doc_id % 3 AS INT) = 2)
    SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx
    FROM v
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video assets: every-5th-frame index explode —
    the typed row-expansion step before per-frame feature extraction.
    `explode(sequence(...))` keeps the expansion JVM-side and lazy."""
    assets = _assets(spark, sf_dir).filter(F.col("meta.kind") == "video")
    frames = F.sequence(
        F.lit(0),
        (F.col("meta.n_bytes") % 30 + 1 - 1).cast("int"),
        F.lit(5),
    )
    return assets.select(
        "doc_id", F.explode(frames).alias("frame_idx")
    ).select("doc_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))


MM_CHUNK_BYTES = 64


@query(
    "mm_chunk_manifest",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, text,
             CAST(length(text) AS BIGINT) AS n_bytes
      FROM documents),
    chunks AS (
      SELECT doc_id, n_bytes, i.i AS chunk_idx,
             CAST(i.i * {MM_CHUNK_BYTES} AS BIGINT) AS offset_bytes,
             CAST(least({MM_CHUNK_BYTES},
                        n_bytes - i.i * {MM_CHUNK_BYTES}) AS BIGINT)
               AS chunk_len,
             md5(substr(text, i.i * {MM_CHUNK_BYTES} + 1, {MM_CHUNK_BYTES}))
               AS chunk_hash
      FROM sized,
           LATERAL (SELECT unnest(range(0,
                      CAST(ceil(n_bytes / {MM_CHUNK_BYTES}.0) AS BIGINT))) AS i) i)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, offset_bytes,
           chunk_len, chunk_hash
    FROM chunks
    """,
)
def mm_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range chunk manifest for binary payloads: each asset split into
    fixed-size ranges with per-chunk content hashes — the manifest a blob
    store / content-addressable cache keeps for large multimodal assets
    (range reads, dedup at chunk granularity, resumable transfer).

    Runs on the payload BYTES (substr on binary stays in codegen; no
    decode, honoring the opaque-blob convention).  The fixture payload is
    utf-8 of ASCII text, so the oracle can express the same ranges with
    text substr + md5 — byte-identical input to the hash on both engines.
    At 100 TB this is a narrow per-row explode bounded by payload size;
    output rows = Σ ceil(bytes/chunk), no shuffle at all."""
    assets = _assets(spark, sf_dir)
    n_chunks = F.ceil(
        F.col("meta.n_bytes").cast("double") / MM_CHUNK_BYTES
    ).cast("int")
    chunked = assets.select(
        "doc_id",
        "payload",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    offset = F.col("chunk_idx").cast("long") * MM_CHUNK_BYTES
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        offset.alias("offset_bytes"),
        F.least(
            F.lit(MM_CHUNK_BYTES).cast("long"), F.col("n_bytes") - offset
        ).alias("chunk_len"),
        F.md5(
            F.expr(f"substring(payload, chunk_idx * {MM_CHUNK_BYTES} + 1, "
                   f"{MM_CHUNK_BYTES})")
        ).alias("chunk_hash"),
    )
