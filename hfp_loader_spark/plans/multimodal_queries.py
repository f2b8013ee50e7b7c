"""Multimodal query catalog (builder brief: binary columns + Pandas UDFs).

``documents.text`` stands in for media bytes (UTF-8 payload both engines
can derive), so even the ``mapInPandas`` feature path gets a DuckDB oracle:
Spark computes features FROM THE BINARY PAYLOAD in Arrow-batched pandas,
the oracle recomputes them from the text — if the plumbing (batching,
schema, byte handling) is wrong, the hashes diverge.  The decode+frame-
sample entry exercises the stubbed codec path (rows-only: nested structs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.operators.multimodal import (
    decode_and_sample_frames,
    extract_features,
    resize_images,
    with_binary_payload,
)
from hfp_loader_spark.plans.catalog import _t, defquery


def _byte_at(i: str, hx: str = "hx") -> str:
    """DuckDB SQL for the ``i``-th (1-based) PAYLOAD BYTE, read out of the
    uppercase hex encoding of the UTF-8 bytes (``hx = hex(encode(text))``).

    ``ascii(text[i])`` would return the i-th CODEPOINT — equal to the byte
    only for pure-ASCII text; rounds 2–3 were lost to exactly this class
    of encoding assumption, so every byte-level oracle goes through hex."""
    return (
        f"(strpos('0123456789ABCDEF', {hx}[2*({i})-1]) - 1) * 16"
        f" + strpos('0123456789ABCDEF', {hx}[2*({i})]) - 1"
    )


@defquery(
    "multimodal_byte_features",
    f"""
    WITH b AS (
      SELECT doc_id, text,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(nb, 0) AS BIGINT) AS n_bytes,
           md5(text)          AS md5_hex,
           CAST(CASE WHEN nb > 0 THEN {_byte_at("1")} ELSE -1 END
                AS INTEGER)   AS first_byte,
           CAST(CASE WHEN nb > 0 THEN
                  list_sum(list_transform(generate_series(1, nb),
                                          i -> {_byte_at("i")})) // nb
                ELSE -1 END AS BIGINT) AS mean_byte
    FROM b
    """,
    doc="Binary-payload feature extraction via Arrow-batched mapInPandas "
    "(size, md5, first/mean byte) — the Pandas-UDF plumbing itself is "
    "oracle-checked because the payload is derivable on both engines. "
    "Byte values are restated from hex(payload), so the oracle holds for "
    "non-ASCII text (md5(VARCHAR) already hashes the UTF-8 bytes). "
    "No shuffle; output partitioning inherits the scan.",
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    return extract_features(docs)


@defquery(
    "multimodal_decode_frames",
    # The fake decoder is md5-digest-driven, so every output column is
    # restatable in SQL: width/height/n_frames come from digest bytes 0/1/3
    # (hex-pair → int arithmetic below), n_sampled = min(n_frames, 4), and
    # the first frame digest is md5 over the UPPERCASE HEX of the payload's
    # first max(n_bytes // n_frames, 1) BYTES — a hex substring both engines
    # can slice for any encoding (nb is octet_length, never a char count).
    """
    WITH parsed AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb, md5(text) AS h
      FROM documents WHERE text IS NOT NULL
    ),
    geom AS (
      SELECT doc_id, hx, nb,
             (strpos('0123456789abcdef', h[1])-1)*16
               + strpos('0123456789abcdef', h[2])-1 AS d0,
             (strpos('0123456789abcdef', h[3])-1)*16
               + strpos('0123456789abcdef', h[4])-1 AS d1,
             (strpos('0123456789abcdef', h[7])-1)*16
               + strpos('0123456789abcdef', h[8])-1 AS d3
      FROM parsed
    )
    SELECT doc_id,
           'video' AS media_type,
           CAST(16 + d0 % 64 AS INTEGER)        AS width,
           CAST(16 + d1 % 64 AS INTEGER)        AS height,
           CAST(1 + d3 % 8 AS INTEGER)          AS n_frames,
           CAST(least(1 + d3 % 8, 4) AS INTEGER) AS n_sampled,
           substr(md5(substring(hx, 1, 2 * greatest(nb // (1 + d3 % 8), 1))),
                  1, 16)                        AS first_frame_digest
    FROM geom
    """,
    doc="Stubbed media decode + uniform frame sampling over mapInPandas: "
    "typed metadata struct, frame offsets and digests — the real Spark "
    "plumbing around a codec that is NotImplementedError-gated in this "
    "environment (deterministic digest-driven fake in its place, which "
    "makes every emitted column SQL-restatable — the oracle recomputes "
    "the decode from the payload).",
)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    decoded = decode_and_sample_frames(docs, media_type="video")
    return decoded.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.size("frame_offsets").alias("n_sampled"),
        F.element_at("frame_digests", 1).alias("first_frame_digest"),
    )


@defquery(
    "multimodal_audio_features",
    f"""
    WITH raw AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents WHERE length(text) > 0
    ),
    b AS (
      SELECT doc_id,
             list_transform(generate_series(1, nb),
                            i -> {_byte_at("i")} - 128) AS xs
      FROM raw
    )
    SELECT doc_id,
           CAST(len(xs) AS BIGINT)                        AS n_samples,
           CAST(ceil(len(xs) / 256.0) AS INTEGER)         AS n_windows,
           CAST(len(list_filter(generate_series(2, len(xs)),
                i -> (xs[i] >= 0) <> (xs[i-1] >= 0))) AS BIGINT)
                                                          AS zero_crossings,
           CAST(list_max(list_transform(xs, x -> abs(x))) AS INTEGER) AS peak,
           format('{{:.4f}}', sqrt(list_avg(list_transform(xs, x -> x * x))))
                                                          AS rms
    FROM b
    """,
    doc="Audio feature extraction (payload as unsigned 8-bit PCM): sample/"
    "window counts, midline zero-crossings, peak, RMS — numpy-vectorized "
    "per Arrow batch. Oracle recomputes every feature from the payload "
    "BYTES (hex-restated, so non-ASCII text works), and the mapInPandas "
    "plumbing itself is hash-checked (RMS as fixed-point text: both "
    "engines sum exactly-representable integer squares, so the doubles "
    "agree bit-for-bit).",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.multimodal import audio_features

    docs = with_binary_payload(
        _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    )
    return audio_features(docs)


@defquery(
    "multimodal_resize",
    f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           8 AS target_width,
           8 AS target_height,
           64 AS n_resized_bytes,
           CAST({_byte_at("1")} AS INTEGER) AS first_resized_byte
    FROM b
    """,
    doc="Decode→resize→re-emit binary over mapInPandas (stub codec, "
    "nearest-neighbor byte sampling as the deterministic fake). The "
    "oracle pins the output CONTRACT both engines can state: one row per "
    "non-empty payload, 8×8 target, 64-byte resized payload whose first "
    "byte is the first input BYTE (hex-restated — holds for non-ASCII).",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(
        _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    )
    resized = resize_images(docs, target_width=8, target_height=8)
    return resized.select(
        "doc_id",
        F.col("target_width").cast("int").alias("target_width"),
        F.col("target_height").cast("int").alias("target_height"),
        F.octet_length("resized").alias("n_resized_bytes"),
        F.conv(F.hex(F.substring(F.col("resized"), 1, 1)), 16, 10)
        .cast("int")
        .alias("first_resized_byte"),
    )


# Shared fingerprint CTE for the blockhash entries: the EXACT all-integer
# restatement of operators.multimodal.blockhash_fingerprints — byte i
# (0-based) lands in bucket i*64//n, bit j set iff bucket_sum*64 >= total,
# 64-bit value assembled in HUGEINT then wrapped to signed BIGINT (DuckDB
# refuses 1::BIGINT << 63; Spark longs wrap natively).
_PHASH_FP_SQL = f"""
    b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ),
    bytes AS (
      SELECT doc_id, nb, i, {_byte_at("i")} AS v
      FROM b, LATERAL (SELECT unnest(generate_series(1, nb)) AS i)
    ),
    sums AS (
      SELECT doc_id, ((i - 1) * 64) // nb AS bucket, sum(v) AS s
      FROM bytes GROUP BY doc_id, bucket
    ),
    tot AS (SELECT doc_id, sum(s) AS total FROM sums GROUP BY doc_id),
    grid AS (
      SELECT doc_id, unnest(generate_series(0, 63)) AS j FROM b
    ),
    bits AS (
      SELECT g.doc_id,
             CASE WHEN coalesce(s.s, 0) * 64 >= t.total
                  THEN (1::HUGEINT << g.j) ELSE 0::HUGEINT END AS bitv
      FROM grid g
      LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.bucket = g.j
      JOIN tot t ON t.doc_id = g.doc_id
    ),
    fp AS (
      SELECT doc_id,
             CAST(CASE WHEN f >= (1::HUGEINT << 63)
                       THEN f - (1::HUGEINT << 64) ELSE f END
                  AS BIGINT) AS phash
      FROM (SELECT doc_id, sum(bitv) AS f FROM bits GROUP BY doc_id)
    )
"""


@defquery(
    "multimodal_blockhash_fingerprints",
    f"""
    WITH {_PHASH_FP_SQL}
    SELECT doc_id, phash FROM fp
    """,
    doc="64-bit blockhash perceptual fingerprint of each binary payload "
    "(operators.multimodal.blockhash_fingerprints, Arrow-batched "
    "mapInPandas): byte-range sums vs the integer global mean — ALL-"
    "integer arithmetic, so unlike token-simhash the fingerprint itself "
    "is exactly value-hash oracle-checked (the oracle rebuilds every "
    "bit from hex(payload) in HUGEINT and wraps to signed BIGINT). "
    "8 bytes per document leave the UDF; media bytes never shuffle.",
)
def multimodal_blockhash_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hfp_loader_spark.operators.multimodal import blockhash_fingerprints

    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    return blockhash_fingerprints(docs)


@defquery(
    "multimodal_phash_neardup",
    f"""
    WITH {_PHASH_FP_SQL}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
    doc="Perceptual near-duplicate media pairs: blockhash fingerprints "
    "fed through the SAME pigeonhole byte-band Hamming<=3 join as "
    "token-simhash (operators.neardup.simhash_near_pairs — a Hamming-3 "
    "pair must agree on one of 4 bands, so discovery is a band-equality "
    "join, never all-pairs). Because blockhash is integer-exact on both "
    "engines, the pair LIST gets a full value-hash oracle (brute-force "
    "xor+bit_count at test SF) — strictly stronger than the simhash "
    "tier's contract-only check. The scale path ships 8-byte hashes; "
    "the brute oracle is the correctness instrument.",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.multimodal import blockhash_fingerprints
    from hfp_loader_spark.operators.neardup import simhash_near_pairs

    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    fps = blockhash_fingerprints(docs).select(
        "doc_id", F.col("phash").alias("simhash")
    )
    pairs = simhash_near_pairs(fps, max_hamming=3)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@defquery(
    "multimodal_dup_clusters",
    f"""
    WITH RECURSIVE {_PHASH_FP_SQL},
    e0 AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
    ),
    edges AS (
      SELECT da AS s, db AS d FROM e0
      UNION ALL
      SELECT db AS s, da AS d FROM e0
    ),
    walk(id, label) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.s, w.label FROM edges e JOIN walk w ON e.d = w.id
    ),
    lab AS (
      SELECT id, CAST(min(label) AS BIGINT) AS cluster_id
      FROM walk GROUP BY id
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(id) AS BIGINT)  AS min_doc_id,
           CAST(max(id) AS BIGINT)  AS max_doc_id
    FROM lab GROUP BY cluster_id
    """,
    doc="Perceptual media duplicate GROUPS: the Hamming≤3 blockhash "
    "pair graph's transitive closure via alternating large-star/"
    "small-star CC — the media twin of sim_semantic_clusters, closing "
    "the same pairs→clusters loop the text tier has (the view a "
    "curation UI shows; downstream keeps one member per cluster). "
    "Pair discovery is the pigeonhole band join (never all-pairs); the "
    "CC is O(log n) rounds of join+aggregate. Oracle: brute xor+"
    "bit_count pairs + recursive-CTE reachability with min-id labels.",
)
def multimodal_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.graph import (
        connected_components_alternating,
    )
    from hfp_loader_spark.operators.multimodal import blockhash_fingerprints
    from hfp_loader_spark.operators.neardup import simhash_near_pairs

    docs = with_binary_payload(_t(spark, sf_dir, "documents"))
    fps = blockhash_fingerprints(docs).select(
        "doc_id", F.col("phash").alias("simhash")
    )
    pairs = simhash_near_pairs(fps, max_hamming=3)
    comp = connected_components_alternating(pairs, src="doc_a", dst="doc_b")
    return comp.groupBy(F.col("component").cast("long").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.min("id").cast("long").alias("min_doc_id"),
        F.max("id").cast("long").alias("max_doc_id"),
    )
