"""Near-duplicate detection: MinHash+LSH, SimHash, and n-gram Jaccard.

Extension tier (SURVEY §2.11) — the large-scale training-data dedup
operators.  Everything is built-in Catalyst expressions (hash/xxhash64,
higher-order array functions, joins); zero Python UDFs.

Scale design (the 100 TB bar — never all-pairs):

- **Exact Jaccard join** (`jaccard_pairs`) explodes distinct shingles and
  self-joins on the shingle.  Cost is Σ|posting list|² per shingle — fine
  when shingles are distinctive (word n-grams), quadratic on stop-shingles.
  It is the *verification* primitive, not the discovery path.
- **MinHash+LSH** (`minhash_signatures` → `lsh_candidate_pairs`) is the
  discovery path: one pass computes k min-hashes per doc, signatures are
  cut into b bands and docs are bucketed by (band, band-hash).  Candidate
  pairs come from a self-join *within buckets only*; expected bucket sizes
  are tiny, so the join is linear-ish in corpus size.  P[candidate] =
  1-(1-s^r)^b — with k=32, b=8, r=4 the curve crosses 0.5 near s≈0.6.
- **SimHash** (`simhash_fingerprints`) gives each doc a 32-bit fingerprint
  by per-bit voting over token hashes; near-dups differ in few bits.
  Pigeonhole banding (4 bytes) finds all pairs within Hamming distance 3
  with a byte-equality join — again no all-pairs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_DEFAULT_OPEN_COST = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default


def _open_cost_bytes(spark) -> int | None:
    """``spark.sql.files.openCostInBytes`` as an int, or ``None`` when the
    value can't be parsed (treat as unknown → take the exact path)."""
    raw = str(spark.conf.get(
        "spark.sql.files.openCostInBytes", str(_DEFAULT_OPEN_COST)
    )).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        return int(raw) * mult
    except ValueError:
        return None


def ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Repartition by ``key`` only when the scan has fewer partitions than
    the cluster's parallelism.

    A small corpus (one parquet file) plans as ONE input partition, so a
    CPU-heavy projection chain (regex tokenize → shingle → hash) runs
    single-threaded no matter how many cores exist.  At real scale the
    input already has thousands of splits and this is a no-op — and the
    many-files case tries to decide that from ``inputFiles()`` alone,
    skipping the plan→RDD conversion ``df.rdd.getNumPartitions()`` costs.

    File count is only a lower bound on scan partitions UNDER THE
    DEFAULT file-packing configs: with the stock 4 MB
    ``spark.sql.files.openCostInBytes`` every file's padded cost is at
    least the split floor, so greedy packing never bin-packs
    ``defaultParallelism`` files into fewer partitions.  A TUNED session
    (open cost lowered toward 0) can pack many small files into one
    partition, so the fast path is gated on the conf still being at or
    above the default — anything lower (or unparseable) falls through to
    the exact ``getNumPartitions`` probe rather than silently skipping
    the repartition this helper exists for."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    open_cost = _open_cost_bytes(spark)
    if (
        open_cost is not None
        and open_cost >= _DEFAULT_OPEN_COST
        and len(df.inputFiles()) >= target
    ):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def shingle_docs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles array) with distinct word n-gram shingles.

    Documents shorter than ``n`` tokens yield an EMPTY array (not a
    dropped row): every consumer here explodes or intersects the array,
    so empties contribute nothing either way — and an explicit
    ``where(size(shingles) > 0)`` is actively harmful, because Catalyst
    pushes the filter (with the whole tokenize+shingle expression
    substituted into it) below the ``ensure_parallelism`` repartition,
    re-running the most expensive projection in the pipeline
    single-threaded on the unsplit input (measured 6× the projection
    cost at sf0.1)."""
    from hfp_loader_spark.operators.text import tokens, word_shingles

    return df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(tokens(F.col(text_col)), n).alias("shingles"),
    )


def jaccard_pairs(
    shingled: DataFrame,
    threshold: float,
    round_to: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs with J ≥ threshold.

    Posting-list self-join on the shingle (doc_a < doc_b), then
    |∩| / (|A|+|B|-|∩|).  Output: (doc_a, doc_b, jaccard).

    ``max_doc_freq``: drop shingles appearing in more than this many
    documents BEFORE the self-join, and recompute per-doc set sizes over
    the retained shingles (so J stays an exact Jaccard — over the
    filtered shingle space).  The join's cost is Σ df² per shingle: one
    stop-shingle shared by 1M docs alone costs 10¹² candidate rows, so an
    uncapped run is quadratic at corpus scale while a capped run is
    linear-ish.  Semantics note: a stop-shingle present in >cap docs
    carries ~zero dedup signal (it cannot distinguish near-dups from the
    background), so dropping it is the standard IDF-style approximation.
    """
    if max_doc_freq is not None:
        from pyspark.sql import Window

        ex = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
        # Shingles are distinct per doc (shingle_docs), so count per
        # shingle IS document frequency.  Both windows re-use the join's
        # own shuffle domains (shingle, then doc) — no extra pass over
        # the corpus beyond one added exchange.
        ex = (
            ex.withColumn("_df", F.count("*").over(Window.partitionBy("shingle")))
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
        posting = ex.withColumn(
            "n_shingles", F.count("*").over(Window.partitionBy("doc_id"))
        )
    else:
        posting = shingled.select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            F.explode("shingles").alias("shingle"),
        )
    a = posting.alias("a")
    b = posting.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n_shingles").alias("na"),
            F.first("b.n_shingles").alias("nb"),
        )
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select(
            "doc_a", "doc_b", F.round(jac, round_to).alias("jaccard")
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32, shingle_hash=None
) -> DataFrame:
    """(doc_id, sig array<long>): k independent min-hashes per document.

    Hash family: xxhash64 seeded by the permutation index via concat.
    Implementation explodes shingles and takes per-doc mins through a
    hash aggregate: the k hashes are computed ONCE per shingle (an
    in-row `transform` per hash would let Catalyst inline — and thus
    recompute — the shingling k times), and map-side partial mins mean
    the shuffle carries k longs per doc per partition, not shingles.

    ``shingle_hash`` ((shingle Column, j int) → Column) overrides the
    default family per permutation — the md5-48-bit variant makes the
    signatures DuckDB-recomputable (see ``dedup_minhash_lsh_exact``);
    keep the xxhash64 default on the hot path (one string hash + k
    long hashes vs k full md5 digests per shingle).
    """
    ex = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    if shingle_hash is not None:
        hashed = ex.select(
            "doc_id",
            *[
                shingle_hash(F.col("shingle"), j).alias(f"_h{j}")
                for j in range(num_hashes)
            ],
        )
    else:
        # Hash the (variable-length) shingle string ONCE; derive the k
        # permutation hashes from the resulting 8-byte long — xxhash64
        # over a long + seed literal costs a fixed few ns vs re-hashing
        # (and re-concatenating) the string k times.
        base = ex.select("doc_id", F.xxhash64("shingle").alias("_h"))
        hashed = base.select(
            "doc_id",
            *[
                F.xxhash64(F.col("_h"), F.lit(j)).alias(f"_h{j}")
                for j in range(num_hashes)
            ],
        )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"_h{j}").alias(f"_h{j}") for j in range(num_hashes)]
    )
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"_h{j}") for j in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 32,
    num_bands: int = 8,
    band_hash=None,
) -> DataFrame:
    """Distinct candidate (doc_a < doc_b) pairs sharing ≥ 1 LSH band.

    Bands hash the signature slice to one long; the bucket join shuffles
    (band, bucket) keys only.  Candidates must be verified (e.g. with
    `jaccard_pairs`-style exact similarity) downstream.

    ``band_hash`` (concatenated-slice Column → Column) overrides the
    default xxhash64 bucket hash (md5-48-bit for the DuckDB-twin
    variant)."""
    rows_per_band = num_hashes // num_bands
    bh = band_hash or F.xxhash64
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    bh(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig").getItem(b * rows_per_band + r)
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(num_bands)
            ]
        )
    )
    bucketed = signatures.select("doc_id", bands.alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    reuse_shingles: bool = True,
    cache_registry: list[DataFrame] | None = None,
    shingle_hash=None,
    band_hash=None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup join, exact-Jaccard verified.

    LSH proposes candidates (linear-ish), exact Jaccard on the candidate
    pairs confirms them — output is (doc_a, doc_b, jaccard ≥ threshold).

    ``reuse_shingles`` persists the shingled corpus (MEMORY_AND_DISK):
    it is consumed three times (signatures + both verification sides),
    and recomputing the regex tokenize + shingle pass is the dominant
    cost — at 100 TB you spill shingles to local disk rather than re-read
    and re-tokenize the corpus twice more.  The cache entries live until
    the session drops them — UNLESS the caller passes ``cache_registry``
    (a list the persisted intermediates are appended to), in which case
    the caller owns their lifetime and should ``unpersist()`` them once
    the pair list is consumed (``pipeline.prepare_corpus`` does this at
    its near-dedup stage boundary; a long-lived session otherwise
    accumulates one shingle cache per call).  Measured 6.7s → 3.3s at
    sf0.1 (PERF.md).
    """
    shingled = shingle_docs(
        ensure_parallelism(df, id_col), id_col, text_col, shingle_n
    )
    if reuse_shingles:
        from pyspark import StorageLevel

        # Eagerly materialized: the three consumers below otherwise run in
        # concurrent stages that each race to (re)compute the un-populated
        # cache — a lazy persist measured zero wall-clock win.
        shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
        shingled.count()
        if cache_registry is not None:
            cache_registry.append(shingled)
    sigs = minhash_signatures(shingled, num_hashes, shingle_hash=shingle_hash)
    if reuse_shingles:
        from pyspark import StorageLevel

        # The band self-join consumes the signatures on BOTH sides; without
        # this the whole shingle→hash→aggregate lineage runs twice more.
        # Tiny: num_hashes longs per doc.
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        sigs.count()
        if cache_registry is not None:
            cache_registry.append(sigs)
    cands = lsh_candidate_pairs(sigs, num_hashes, num_bands, band_hash=band_hash)
    sets_a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sets_b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    verified = (
        cands.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold)


def index_signature_params(
    spark, root: str, version: int | None = None
) -> dict | None:
    """The signature-construction stamp of a persisted index's manifest
    (``None`` on an empty root).  Every :func:`save_signature_index`
    commit records how its signatures were built — text representation,
    shingle width, hash count — so a later reader can refuse to compare
    against signatures built differently instead of silently
    under-matching."""
    from hfp_loader_spark.versioned import _read_manifest, latest_version

    head = latest_version(spark, root)
    if head is None:
        return None
    v = head if version is None else version
    meta = _read_manifest(spark, root, v).meta or {}
    return meta.get("signature_params")


def restamp_signature_index(
    spark,
    root: str,
    text_representation: str,
    shingle_n: int,
    num_hashes: int,
) -> int:
    """Stamp a PRE-MARKER signature index with ``signature_params`` via a
    manifest-only append — the migration path for indexes built before
    :func:`save_signature_index` started recording how signatures were
    constructed.  Returns the committed version.

    The caller asserts, after OUT-OF-BAND verification (the job config
    that built the index, a sample re-hash), that the stored signatures
    were built with exactly these parameters; this helper cannot verify
    the text representation from the data, which is the whole reason the
    stamp exists.  What it CAN check it does: the index must exist, must
    not already carry a (different) stamp — a mis-stamped index is a
    rebuild, not a restamp — and the stored signature WIDTH must equal
    ``num_hashes``, read from one row of the head snapshot.

    The commit appends ZERO data rows (an empty frame of the stored
    schema): a pure manifest write carrying the stamp, after which
    ``save_signature_index(mode='append')`` and
    :func:`dedup_delta_against_index` accept the index."""
    from hfp_loader_spark.versioned import (
        commit_snapshot,
        latest_version,
        read_snapshot,
    )

    if latest_version(spark, root) is None:
        raise FileNotFoundError(
            f"no signature index at {root!r} — nothing to restamp"
        )
    params = {
        "text_representation": text_representation,
        "shingle_n": shingle_n,
        "num_hashes": num_hashes,
    }
    stored = index_signature_params(spark, root)
    if stored == params:
        raise ValueError(
            f"signature index at {root!r} already carries exactly this "
            "stamp — restamping again would only add an empty commit"
        )
    if stored is not None:
        raise ValueError(
            f"signature index at {root!r} is already stamped with "
            f"{stored}; restamp is only for pre-marker indexes — a "
            "wrongly-stamped index must be rebuilt, not restamped"
        )
    head = read_snapshot(spark, root)
    sample = head.select(F.size("sig").alias("_w")).take(1)
    if sample and sample[0]["_w"] != num_hashes:
        raise ValueError(
            f"stored signatures at {root!r} are {sample[0]['_w']} hashes "
            f"wide but the restamp claims num_hashes={num_hashes}; the "
            "width is readable from the data and contradicts the claim"
        )
    return commit_snapshot(
        spark,
        head.limit(0),
        root,
        mode="append",
        meta={"signature_params": params},
    )


def _check_signature_params(
    stored: dict | None,
    root: str,
    text_representation: str,
    shingle_n: int,
    num_hashes: int,
) -> None:
    want = {
        "text_representation": text_representation,
        "shingle_n": shingle_n,
        "num_hashes": num_hashes,
    }
    if stored is None:
        raise ValueError(
            f"signature index at {root!r} carries no signature_params "
            "stamp — it predates the manifest marker, so its text "
            "representation is unknown and mixing it with new "
            f"{want} signatures could silently under-match near-dups; "
            "rebuild the index (save_signature_index stamps every "
            "commit), or — after verifying out-of-band how its "
            "signatures were built — restamp it with "
            "restamp_signature_index"
        )
    if stored != want:
        raise ValueError(
            f"signature index at {root!r} was built with {stored} but "
            f"this call uses {want}; comparing signatures across "
            "representations silently deflates every match — rebuild "
            "the index or pass matching parameters"
        )


def save_signature_index(
    spark,
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    mode: str = "append",
    text_representation: str = "raw",
) -> int:
    """Persist MinHash signatures as a versioned-table snapshot — the
    corpus-history side of incremental dedup.

    At 100 TB you never re-shingle the whole history to dedup a daily
    delta: each ingest APPENDS its batch's ``(doc_id, sig)`` rows
    (``mode='append'`` = O(1) manifest commit on top of the stored
    parquet), and the delta join reads signatures — 32 longs per doc —
    instead of documents.  Returns the committed version.

    Every manifest is STAMPED with ``signature_params`` — the text
    representation the caller hashed (``'raw'`` = pre-scrub, the
    pipeline's contract), shingle width, and hash count.  An append onto
    an index stamped with DIFFERENT params fails fast: signatures built
    from different representations never collide correctly, so a mixed
    index silently stops finding near-dups across the boundary —
    exactly the failure the stamp exists to make loud."""
    from hfp_loader_spark.versioned import commit_snapshot

    params = {
        "text_representation": text_representation,
        "shingle_n": shingle_n,
        "num_hashes": num_hashes,
    }
    if mode == "append":
        stored = index_signature_params(spark, root)
        if stored is not None or _index_has_commits(spark, root):
            _check_signature_params(
                stored, root, text_representation, shingle_n, num_hashes
            )
    sigs = minhash_signatures(
        shingle_docs(ensure_parallelism(docs, id_col), id_col, text_col, shingle_n),
        num_hashes,
    )
    return commit_snapshot(
        spark, sigs, root, mode=mode, meta={"signature_params": params}
    )


def _index_has_commits(spark, root: str) -> bool:
    from hfp_loader_spark.versioned import latest_version

    return latest_version(spark, root) is not None


def dedup_delta_against_index(
    spark,
    delta: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    version: int | None = None,
    estimate_threshold: float | None = None,
    text_representation: str = "raw",
) -> DataFrame:
    """LSH candidates of a NEW batch against the persisted signature
    index (plus within-batch pairs): every ``(doc_a, doc_b)`` candidate
    pair — ordered ``doc_a < doc_b`` by id, so either side may be the
    delta document — where AT LEAST ONE side belongs to the delta
    (history×history pairs were reported by earlier ingests).  Callers
    pruning the delta should keep whichever element of each pair is in
    their batch, not a fixed column.

    The incremental shape: only the delta is shingled and hashed; the
    history contributes stored signatures.  Raw LSH candidates include
    band collisions between genuinely dissimilar documents, so with
    ``estimate_threshold`` set each pair is scored by the SIGNATURE-
    estimated Jaccard (fraction of matching minhash components —
    unbiased, std ≈ sqrt(J(1-J)/k)) and only pairs at or above the
    threshold return, with the score in an ``est_jaccard`` column.
    This is the right verifier for the incremental path, where the
    history's text cannot be re-read; callers holding BOTH texts can
    instead exact-verify like :func:`minhash_lsh_pairs`' stage.  Cost
    per ingest: O(|delta|) hashing + a bucket join whose history side
    is the banded index, never a history re-scan of text.

    Bootstraps an EMPTY history: on a fresh ``root`` with no committed
    version the history side is an empty frame (within-batch pairs only)
    — the very first ingest must not fail just because nothing precedes
    it.  Fails fast on a parameter mismatch, twice over: the manifest's
    ``signature_params`` stamp must equal this call's (text
    representation, shingle_n, num_hashes) — a stored index hashed from
    a DIFFERENT text representation (e.g. post-PII-scrub) never matches
    raw-text delta signatures, silently missing every cross-boundary
    near-dup — and the stored signature WIDTH is re-checked from the
    data as a backstop, since zip-comparing mismatched widths would
    NULL-pad and deflate every ``est_jaccard`` below threshold.

    The returned pair list is persisted and eagerly materialized so the
    (larger) signature-union cache can be released before returning —
    a long-running ingest stream calls this per micro-batch, and leaked
    MEMORY_AND_DISK entries would otherwise accrete per batch.  Callers
    should ``unpersist()`` the result when done with it."""
    from hfp_loader_spark.versioned import latest_version, read_snapshot

    delta_sigs = minhash_signatures(
        shingle_docs(ensure_parallelism(delta, id_col), id_col, text_col, shingle_n),
        num_hashes,
    )
    if version is None and latest_version(spark, root) is None:
        # fresh index: first batch dedups only within itself; its own
        # signature append (the caller's job) creates version 0
        hist = delta_sigs.limit(0)
    else:
        _check_signature_params(
            index_signature_params(spark, root, version),
            root,
            text_representation,
            shingle_n,
            num_hashes,
        )
        hist = read_snapshot(spark, root, version)
        stored = hist.select(F.size("sig").alias("n")).limit(1).collect()
        if stored and stored[0]["n"] != num_hashes:
            raise ValueError(
                f"signature index at {root!r} stores {stored[0]['n']}-hash "
                f"signatures but num_hashes={num_hashes}; zip-comparing "
                "mismatched widths would silently under-estimate Jaccard — "
                "rebuild the index or pass the matching num_hashes"
            )
    from pyspark import StorageLevel

    # Both sides of the bucket join AND the verify re-join consume the
    # signatures — persist once (32 longs/doc, same rationale as
    # simhash_near_pairs).  A doc_id present in BOTH history and delta
    # (a re-run without the streaming checkpoint) would fan the sig-lookup
    # joins out into duplicate pair rows with ambiguous signatures, so
    # collapse to one row per doc preferring the HISTORY signature (the
    # committed truth) via min_by on a source tag.
    both = (
        hist.select("doc_id", "sig")
        .withColumn("_src", F.lit(0))
        .unionByName(delta_sigs.withColumn("_src", F.lit(1)))
        .groupBy("doc_id")
        .agg(F.min_by("sig", "_src").alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = lsh_candidate_pairs(both, num_hashes, num_bands)
    delta_ids = delta.select(F.col(id_col).alias("doc_b")).distinct()
    # keep pairs touching the delta (history×history pairs were reported
    # by earlier ingests); doc_a < doc_b ordering comes from the LSH join
    touch_b = pairs.join(F.broadcast(delta_ids), "doc_b", "left_semi")
    touch_a = pairs.join(
        F.broadcast(delta_ids.select(F.col("doc_b").alias("doc_a"))),
        "doc_a",
        "left_semi",
    )
    out = (
        touch_b.select("doc_a", "doc_b")
        .unionByName(touch_a.select("doc_a", "doc_b"))
        .distinct()
    )
    if estimate_threshold is not None:
        sig_a = both.select(
            F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa")
        )
        sig_b = both.select(
            F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb")
        )
        est = (
            F.aggregate(
                F.zip_with(
                    F.col("_sa"),
                    F.col("_sb"),
                    lambda a, b: F.when(a == b, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.lit(num_hashes)
        )
        out = (
            out.join(sig_a, "doc_a")
            .join(sig_b, "doc_b")
            .withColumn("est_jaccard", est)
            .where(F.col("est_jaccard") >= estimate_threshold)
            .select(
                "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
            )
        )
    # Materialize the (small) pair list, then release the signature-union
    # cache: pairs are what callers consume repeatedly; the union was only
    # needed to build them.  Recompute after a caller-side unpersist is
    # deterministic (pure hashing), just slower.
    from pyspark import StorageLevel as _SL

    out = out.persist(_SL.MEMORY_AND_DISK)
    out.count()
    both.unpersist()
    return out


def decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    broadcast_heldout: bool = True,
) -> DataFrame:
    """Train/benchmark contamination report: corpus documents sharing at
    least one word ``n``-gram with any held-out / benchmark document.

    The standard LLM-pipeline decontamination primitive (the GPT-3 /
    benchmark-overlap recipe): shingle both sides into word n-grams, then
    flag every training document whose shingle set intersects the
    benchmark's.  Output: ``(doc_id, n_matched_spans, n_bench_docs)`` —
    distinct contaminated spans and distinct benchmark documents
    implicated, one row per flagged corpus doc (clean docs are absent).

    Scale design: the benchmark side is orders of magnitude smaller than
    the training corpus (thousands of eval docs vs billions of training
    docs), so its distinct shingle set is hashed to 8-byte longs
    (``xxhash64`` — join keys only, never returned) and **broadcast**;
    the corpus streams through one map-side hash join with no shuffle of
    corpus shingles at all.  Set ``broadcast_heldout=False`` when the
    held-out side is genuinely large: the join falls back to a shuffle
    on the shingle hash, still linear.  A 2⁻⁶⁴ hash collision could
    overcount a span; acceptable for a flagging report (the span COUNT
    is advisory, the flag needs any true match).
    """
    c = shingle_docs(ensure_parallelism(corpus, id_col), id_col, text_col, n)
    # the bench side is small but its tokenize+shingle pass is the same
    # CPU-heavy chain — a single-file benchmark otherwise runs it on ONE
    # core while 31 idle (ensure_parallelism is a no-op once the input
    # has ≥ cores files)
    h = shingle_docs(ensure_parallelism(heldout, id_col), id_col, text_col, n)
    bench = (
        h.select(
            F.col("doc_id").alias("bench_id"),
            F.explode("shingles").alias("shingle"),
        )
        .select("bench_id", F.xxhash64("shingle").alias("_sh"))
        .distinct()
    )
    if broadcast_heldout:
        bench = F.broadcast(bench)
    ex = c.select("doc_id", F.explode("shingles").alias("_s")).select(
        "doc_id", F.xxhash64("_s").alias("_sh")
    )
    return (
        ex.join(bench, "_sh")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("_sh").alias("n_matched_spans"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token hashes.

    For each bit position, +1 if the token's 64-bit hash has the bit set
    else -1; the fingerprint sets bits with a positive total.  One narrow
    projection per document — aggregate over the in-row token array, no
    explode.  64 bits (not 32) keeps unrelated documents far apart even on
    small vocabularies.

    ``token_hash`` (Column → Column) overrides the default ``xxhash64``
    token hash.  The md5-48-bit variant (``conv(substr(md5(t),1,12),16,
    10)`` with ``bits=48``) produces fingerprints DuckDB can recompute
    exactly — the cross-engine-reproducible provenance fingerprint; keep
    the xxhash64 default on the hot path (one hash vs md5's full digest).
    """
    from hfp_loader_spark.operators.text import tokens

    toks = tokens(F.col(text_col))

    def fp_given(th):
        # th is a LET-BOUND lambda variable: the 64 per-bit votes each
        # reference the token-hash array, and interpreted expression
        # trees re-evaluate every reference — unbound, the tokenizer +
        # hash pass would re-run per BIT per row (64×)
        def bit_vote(b: int):
            return F.aggregate(
                th,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1),
            )

        return reduce(
            lambda acc, b: acc
            + F.when(
                bit_vote(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long")),
            range(bits),
            F.lit(0).cast("long"),
        )

    th_expr = F.transform(toks, token_hash or (lambda t: F.xxhash64(t)))
    fingerprint = F.element_at(
        F.transform(F.array(th_expr), lambda th: fp_given(th)), 1
    )
    return df.select(
        F.col(id_col).alias("doc_id"), fingerprint.alias("simhash")
    )


def simhash_near_pairs(
    fingerprints: DataFrame, max_hamming: int = 3, bits: int = 64
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` via pigeonhole bands.

    Split the fingerprint into (max_hamming+1) byte-bands: any pair with
    ≤ max_hamming differing bits agrees on at least one band, so a
    band-equality join finds all of them without an all-pairs product.

    The fingerprints are persisted eagerly before banding: the banded
    projection references ``simhash`` once per band (plus the carried
    column), and BOTH sides of the bucket self-join consume it — with an
    unmaterialized input, Catalyst collapses the 64-bit-vote expression
    into every reference and the fingerprint pass re-runs ~8× (measured
    21.6s → 2.8s at sf0.1).  Tiny: one long per doc.
    """
    from pyspark import StorageLevel

    fingerprints = fingerprints.persist(StorageLevel.MEMORY_AND_DISK)
    fingerprints.count()
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    banded = fingerprints.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def fuzzy_pairs_blocked(
    df: DataFrame, id_col: str, text_col: str, max_subs: int = 1
) -> DataFrame:
    """Edit-distance pairs via pigeonhole blocking — never all-pairs.

    Finds (id_a, id_b) with EQUAL-length values and levenshtein ≤
    ``max_subs`` (equal length ⇒ the distance is pure substitutions).
    Pigeonhole: split each value into ``max_subs + 1`` contiguous chunks;
    ≤ max_subs substitutions leave at least one chunk IDENTICAL, so an
    equality join per chunk index finds every true pair — exact recall
    with candidate sets ~|block|² instead of |corpus|².  (The PartEnum /
    PassJoin family; the same pigeonhole SimHash uses on bit-bytes.)

    Shape at scale: k+1 equality shuffle joins on (chunk_idx, chunk,
    length) unioned then distinct; levenshtein runs JVM-side only on
    candidates. Block key includes length, so skew = count of same-length
    same-chunk values — salt or lengthen chunks if a block melts.

    ``max_subs=1`` uses wildcard-position blocking instead (FastSS
    family): each value explodes into ``len`` variants with position i
    replaced by a sentinel; two equal-length values within one
    substitution share EXACTLY the variant wildcarded at their differing
    position (or every variant, when equal).  Chunk blocking degenerates
    quadratically on shared-prefix corpora — ``Customer#0000…`` names
    all share chunk 1, making one block the whole table (measured: the
    chunked join at 15k such names is ~112M candidate pairs and minutes
    of levenshtein; wildcard blocks hold only the ~10 values differing
    at that position).  Cost: len× row blowup into the join, linear in
    corpus size; recall stays exact."""
    if max_subs == 1:
        # sequence(1, greatest(len, 1)): an empty string still emits ONE
        # (degenerate) variant — F.sequence(1, 0) would yield the
        # DESCENDING [1, 0] and fabricate variants — and the length in
        # the join key keeps equal-length semantics exact (without it,
        # the empty string's variant NUL would collide with every
        # 1-character value's variant).
        v = (
            df.select(
                F.col(id_col).alias("_id"),
                F.col(text_col).alias("_txt"),
                F.length(text_col).alias("_len"),
                F.explode(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(text_col), F.lit(1))
                    )
                ).alias("_i"),
            )
            # wildcard position _i with a sentinel no real key contains
            .select(
                "_id",
                "_len",
                F.expr(
                    "concat(substring(_txt, 1, _i - 1), '\\u0000', "
                    "substring(_txt, _i + 1))"
                ).alias("_variant"),
            )
        )
        a = v.select(F.col("_id").alias("id_a"), "_len", "_variant")
        b = v.select(F.col("_id").alias("id_b"), "_len", "_variant")
        return (
            a.join(b, ["_len", "_variant"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    n_chunks = max_subs + 1
    length = F.length(F.col(text_col))
    sides = []
    for i in range(n_chunks):
        # chunk i of n: [floor(i·len/n)+1, floor((i+1)·len/n)], 1-based
        chunk = F.expr(
            f"substring({text_col}, cast(length({text_col})*{i}/{n_chunks} as int)+1, "
            f"cast(length({text_col})*{i + 1}/{n_chunks} as int)"
            f" - cast(length({text_col})*{i}/{n_chunks} as int))"
        )
        sides.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(text_col).alias("_txt"),
                F.lit(i).alias("_chunk_idx"),
                chunk.alias("_chunk"),
                length.alias("_len"),
            )
        )
    blocked = sides[0]
    for s in sides[1:]:
        blocked = blocked.unionByName(s)
    a = blocked.select(
        F.col("_id").alias("id_a"), F.col("_txt").alias("txt_a"),
        "_chunk_idx", "_chunk", "_len",
    )
    b = blocked.select(
        F.col("_id").alias("id_b"), F.col("_txt").alias("txt_b"),
        "_chunk_idx", "_chunk", "_len",
    )
    cand = (
        a.join(b, ["_chunk_idx", "_chunk", "_len"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "txt_a", "txt_b")
        .distinct()
    )
    return cand.where(
        F.levenshtein("txt_a", "txt_b") <= max_subs
    ).select("id_a", "id_b")


def decontaminate_bloom_gated(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Two-phase decontamination: Bloom prefilter, then exact verify —
    same output contract as :func:`decontaminate` (no false negatives is
    a Bloom theorem, and every gated doc is re-checked exactly, so the
    result is IDENTICAL by construction).

    When the benchmark side is too large to broadcast its full distinct
    shingle-hash set (a cross-suite eval corpus can carry billions of
    distinct 8-grams), phase 1 broadcasts a FIXED-SIZE bit set instead
    (≤ ``num_bits`` rows): every corpus shingle probes the filter
    map-side and a document survives the gate iff ANY shingle is
    maybe-present.  Phase 2 runs the exact hash join of
    :func:`decontaminate` over the gated documents only — typically a
    tiny fraction of the corpus, so the expensive exact side now
    broadcasts against a sliver.  Trade: the probe computes
    ``num_hashes`` bit positions per corpus shingle (more map-side
    arithmetic than one hash join) in exchange for an O(num_bits)
    broadcast independent of benchmark size.
    """
    from hfp_loader_spark.operators.sketches import (
        _bucket as _bloom_bit,
        bloom_build,
    )

    bench_keys = (
        shingle_docs(ensure_parallelism(heldout, id_col), id_col, text_col, n)
        .select(F.explode("shingles").alias("_s"))
        .select(F.xxhash64("_s").alias("_sh"))
        .distinct()
    )
    bits = bloom_build(
        bench_keys, "_sh", num_bits=num_bits, num_hashes=num_hashes
        # ≤ num_bits rows, lazily pinned (optimization r17): the k
        # chained semi joins below each reference this frame, and every
        # unpinned reference replayed the benchmark shingle+distinct+
        # bloom aggregate (5 extra benchmark passes in the committed
        # plan).  The built filter is the designed reuse artifact.
    ).localCheckpoint(eager=False)
    # Gate the corpus with k chained BROADCAST LEFT-SEMI joins against
    # the ≤ num_bits-row bit-set frame — semi join j keeps a shingle row
    # iff its j-th probe bit is set, so surviving the chain means ALL k
    # bits are set (the Bloom maybe-present verdict), entirely map-side.
    # The only exchange before phase 2 is the distinct over SURVIVING
    # doc ids: the earlier formulation exploded probes k× and shuffled
    # the full distinct (doc, shingle) set through a hash aggregation
    # just to count bit hits.  Chained semi joins also keep the plan
    # LAZY end-to-end (an alternative — packing the filter into an
    # array literal probed via getbit — runs an eager collect job at
    # DataFrame-construction time, which a catalog builder must not).
    ex = (
        shingle_docs(ensure_parallelism(corpus, id_col), id_col, text_col, n)
        .select("doc_id", F.explode("shingles").alias("_s"))
        .select("doc_id", F.xxhash64("_s").alias("_sh"))
    )
    for j in range(num_hashes):
        ex = ex.join(
            F.broadcast(bits),
            _bloom_bit(F.col("_sh"), j, num_bits) == bits["bit"],
            "left_semi",
        )
    gated = ex.select("doc_id").distinct()
    survivors = corpus.join(
        gated.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )
    return decontaminate(survivors, heldout, id_col, text_col, n=n)


def cross_source_overlap(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    round_to: int = 4,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair
    (a < b), how many DISTINCT word n-gram shingles they share, and the
    overlap coefficient ``|A∩B| / min(|A|,|B|)`` — the dataset-forensics
    view that answers "which of my sources are mirrors / scrapes of
    each other?" before near-dup machinery is pointed at them.  Pairs
    sharing nothing still get a row (n_shared 0) so the matrix is
    complete.

    Scale shape: one distinct over (source, shingle) — corpus-sized,
    map-side combined — then a posting-list self-join ON THE SHINGLE,
    so only co-occurring shingles pair up (never sources × corpus); the
    per-source sizes and the final S² matrix are broadcast-joined.
    Skew note: a stop-shingle appearing in all S sources fans out S²
    rows for that shingle alone — the same df-cap lever jaccard_pairs
    uses applies here if S is large."""
    toks_sh = shingle_docs(docs.select(
        F.col(source_col).alias("doc_id"), F.col(text_col)
    ), "doc_id", text_col, n)
    sh = (
        toks_sh.select(
            F.col("doc_id").alias("_src"),
            F.explode("shingles").alias("_sh"),
        )
        .distinct()
        # lazily pinned (optimization r17): both Σ-shared join sides and
        # the per-source sizes consume this frame; unpinned, each branch
        # replays the corpus tokenize+shingle+distinct.  No value change.
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("_src").agg(F.count("*").alias("_n"))
    shared = (
        sh.select(F.col("_src").alias("source_a"), "_sh")
        .join(
            sh.select(F.col("_src").alias("source_b"), F.col("_sh").alias(
                "_shb"
            )),
            F.col("_sh") == F.col("_shb"),
        )
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("_shared"))
    )
    srcs = docs.select(
        F.col(source_col).alias("_s")
    ).distinct()
    matrix = (
        srcs.select(F.col("_s").alias("source_a"))
        .join(
            F.broadcast(srcs.select(F.col("_s").alias("source_b"))),
            F.col("source_a") < F.col("source_b"),
        )
    )
    # sizes join LEFT + coalesce: a source whose every document is
    # shorter than n tokens has zero shingles — it must still appear in
    # the matrix (n 0, overlap NULL: 0/0 is unmeasured, not clean)
    n_shared = F.coalesce(F.col("_shared"), F.lit(0))
    return (
        matrix.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .join(
            F.broadcast(sizes.select(
                F.col("_src").alias("source_a"), F.col("_n").alias("n_a")
            )),
            "source_a",
            "left",
        )
        .join(
            F.broadcast(sizes.select(
                F.col("_src").alias("source_b"), F.col("_n").alias("n_b")
            )),
            "source_b",
            "left",
        )
        .select(
            "source_a",
            "source_b",
            n_shared.alias("n_shared"),
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
            F.round(
                F.when(
                    F.least(
                        F.coalesce(F.col("n_a"), F.lit(0)),
                        F.coalesce(F.col("n_b"), F.lit(0)),
                    )
                    > 0,
                    n_shared
                    / F.least("n_a", "n_b").cast("double"),
                ),
                round_to,
            ).alias("overlap"),
        )
    )


def containment_pairs(
    shingled: DataFrame,
    threshold: float,
    round_to: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC n-gram containment join: ordered pairs where
    ``|A∩B| / |A| ≥ threshold`` — the signal Jaccard structurally
    misses: a short document quoted whole inside a much longer one has
    containment ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0, so a Jaccard-thresholded
    dedup keeps the duplicate.  Broder (1997) defines both measures;
    curation pipelines need containment for quote/subset detection and
    Jaccard for near-identity.

    Output: ``(doc_a, doc_b, containment)`` — one row PER DIRECTION that
    clears the threshold (doc_a is the contained side; ``doc_a ≠
    doc_b``), so a mutual-containment (near-identical) pair appears
    twice.  Documents with zero shingles never appear (0/0 has no
    subset reading).

    Scale shape: identical to :func:`jaccard_pairs` — one posting-list
    self-join on the shingle with the SAME df-cap lever (the cap drops
    stop-shingles before the join and recomputes |A| over retained
    shingles, keeping the ratio exact over the filtered space)."""
    if max_doc_freq is not None:
        from pyspark.sql import Window

        ex = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
        ex = (
            ex.withColumn(
                "_df", F.count("*").over(Window.partitionBy("shingle"))
            )
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
        posting = ex.withColumn(
            "n_shingles", F.count("*").over(Window.partitionBy("doc_id"))
        )
    else:
        posting = shingled.select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            F.explode("shingles").alias("shingle"),
        )
    a = posting.alias("a")
    b = posting.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").alias("_inter"),
            F.first(F.col("a.n_shingles")).alias("_na"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("_inter") / F.col("_na").cast("double"), round_to
            ).alias("containment"),
        )
    )
    return pairs.where(F.col("containment") >= F.lit(float(threshold)))


def weighted_jaccard_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Cross-source WEIGHTED Jaccard matrix over token frequencies:

        wj(a, b) = Σ_t min(tf_a(t), tf_b(t)) / Σ_t max(tf_a(t), tf_b(t))
                 = Σmin / (T_a + T_b − Σmin)

    The multiset companion to :func:`source_containment_matrix`'s
    set-overlap view: set overlap says two sources share VOCABULARY,
    weighted Jaccard says they share the same text in the same
    PROPORTIONS — a mirror scores near 1 here even when both sources
    also carry large distinct tails that dilute plain Jaccard.

    The Σmax denominator never materializes: over the term union,
    Σmax = T_a + T_b − Σmin (token totals minus the overlap), so only
    terms present in BOTH sources are ever paired.

    Scale shape: one (source, term) count aggregate — corpus-sized,
    map-side combined — then a posting-list self-join ON THE TERM
    (per-term fanout ≤ C(S,2); the stop-term df-cap lever applies when
    S is large), per-source totals and the final S² matrix broadcast
    (Aggregate-bounded frames).  Pairs sharing nothing still get a row
    (wj 0); a tokenless source pairs with NULL wj (0/0 unmeasured)."""
    from hfp_loader_spark.operators.text import tokens

    tf = (
        docs.select(
            F.col(source_col).alias("_src"),
            F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "_t"
            ),
        )
        .groupBy("_src", "_t")
        .agg(F.count("*").alias("_tf"))
        # lazily pinned (optimization r17): four plan branches consume
        # this frame (both Σmin join sides, totals twice) and each
        # otherwise replays the corpus tokenize+count — same fix as
        # weighted_minhash_matrix, no value change.
        .localCheckpoint(eager=False)
    )
    totals = tf.groupBy("_src").agg(F.sum("_tf").alias("_tot"))
    shared = (
        tf.select(F.col("_src").alias("source_a"), "_t", F.col("_tf").alias("_fa"))
        .join(
            tf.select(
                F.col("_src").alias("source_b"),
                F.col("_t").alias("_tb"),
                F.col("_tf").alias("_fb"),
            ),
            F.col("_t") == F.col("_tb"),
        )
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.least("_fa", "_fb")).alias("_smin"))
    )
    srcs = docs.select(F.col(source_col).alias("_s")).distinct()
    matrix = srcs.select(F.col("_s").alias("source_a")).join(
        F.broadcast(srcs.select(F.col("_s").alias("source_b"))),
        F.col("source_a") < F.col("source_b"),
    )
    smin = F.coalesce(F.col("_smin"), F.lit(0)).cast("double")
    ta = F.coalesce(F.col("_ta"), F.lit(0)).cast("double")
    tb = F.coalesce(F.col("_tb_tot"), F.lit(0)).cast("double")
    denom = ta + tb - smin
    return (
        matrix.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .join(
            F.broadcast(
                totals.select(
                    F.col("_src").alias("source_a"), F.col("_tot").alias("_ta")
                )
            ),
            "source_a",
            "left",
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("_src").alias("source_b"),
                    F.col("_tot").alias("_tb_tot"),
                )
            ),
            "source_b",
            "left",
        )
        .select(
            "source_a",
            "source_b",
            smin.cast("long").alias("shared_weight"),
            F.when(denom > 0, F.round(smin / denom, round_to)).alias(
                "weighted_jaccard"
            ),
        )
    )


def weighted_minhash_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 16,
    tf_cap: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Weighted-Jaccard ESTIMATES between sources via bag-expansion
    MinHash, next to the exact value — the sketch path for
    :func:`weighted_jaccard_matrix` at scales where the exact Σmin join
    is too hot, plus its own accuracy readout:

    - each (source, term) with capped frequency tf emits occurrence
      tokens ``term:1 … term:tf`` (the classic multiset-as-set
      expansion: plain MinHash over the expanded set estimates exactly
      the weighted Jaccard of the capped tf vectors);
    - ``num_hashes`` independent md5 families (``j:term:i``) reduce to
      per-source min-hash signatures — md5-derived, so ANY engine
      recomputes the identical sketch (full oracle, not a contract);
    - est = fraction of agreeing signature slots per source pair;
      exact = Σmin/Σmax of the SAME capped tf vectors, so est→exact as
      k grows and the pair (est, exact) exposes the estimator error
      directly in the output.

    ``tf_cap`` bounds the expansion: an uncapped heavy term (tf 10⁶)
    would explode a million rows alone; capping at 64 keeps the
    expansion ≤ 64 rows per (source, term) while preserving the
    measure on capped weights — both columns use the SAME cap, so the
    comparison stays apples-to-apples (the standard BM25-style tf
    saturation argument).

    Scale shape: one (source, term) count, a ≤``tf_cap``-way in-row
    sequence explode, ``num_hashes`` min-aggregates into one
    |sources|-row signature frame, then the exact-Σmin term join (cap
    applied) and a broadcast signature cross-pair.  Output: complete
    S² matrix (source_a, source_b, est_wj, exact_wj) — built from the
    DISTINCT sources of ``docs`` (like :func:`weighted_jaccard_matrix`),
    so a source whose documents tokenize to NOTHING still appears:
    est_wj/exact_wj = 0.0 against a non-empty source (the true weighted
    Jaccard of an empty bag) and NULL when both sides are empty (0/0
    undefined), mirroring the exact sibling's NULL-denominator rule."""
    from hfp_loader_spark.operators.text import tokens

    def h48(col: F.Column | str, prefix) -> F.Column:  # 48-bit md5 int
        return F.conv(
            F.substring(F.md5(F.concat(prefix, col)), 1, 12), 16, 10
        ).cast("long")

    tf = (
        docs.select(
            F.col(source_col).alias("_src"),
            F.explode(
                tokens(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("_t"),
        )
        .groupBy("_src", "_t")
        .agg(F.least(F.count("*"), F.lit(tf_cap)).alias("_tf"))
        # lazily pinned (optimization r17, guide §2.4/§5): five plan
        # branches consume this frame (occurrence expansion, both sides
        # of the exact Σmin self-join, the per-source totals twice) and
        # each branch otherwise replays the corpus tokenize+count pass —
        # 16 parquet scans / 40 exchanges in the committed r16 plan.
        # The (source, term, tf) frame is the aggregated term table
        # (vocab-bounded per source, far below corpus size); pinning it
        # changes no value, it only stops the replay.
        .localCheckpoint(eager=False)
    )
    occ = tf.select(
        "_src",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("_tf")),
                lambda i: F.concat(
                    F.col("_t"), F.lit(":"), i.cast("string")
                ),
            )
        ).alias("_occ"),
    )
    sigs = occ.groupBy("_src").agg(
        *[
            F.min(h48(F.col("_occ"), F.lit(f"{j}:"))).alias(f"_m{j}")
            for j in range(num_hashes)
        ]
    )
    a = sigs.select(
        F.col("_src").alias("source_a"),
        F.lit(1).alias("_hasa"),
        *[F.col(f"_m{j}").alias(f"_a{j}") for j in range(num_hashes)],
    )
    b = sigs.select(
        F.col("_src").alias("source_b"),
        F.lit(1).alias("_hasb"),
        *[F.col(f"_m{j}").alias(f"_b{j}") for j in range(num_hashes)],
    )
    agree = None
    for j in range(num_hashes):
        m = F.when(F.col(f"_a{j}") == F.col(f"_b{j}"), 1).otherwise(0)
        agree = m if agree is None else agree + m
    srcs = docs.select(F.col(source_col).alias("_s")).distinct()
    pairs = srcs.select(F.col("_s").alias("source_a")).join(
        F.broadcast(srcs.select(F.col("_s").alias("source_b"))),
        F.col("source_a") < F.col("source_b"),
    )
    est = (
        pairs.join(F.broadcast(a), "source_a", "left")
        .join(F.broadcast(b), "source_b", "left")
        .select(
            "source_a",
            "source_b",
            F.when(
                F.col("_hasa").isNull() & F.col("_hasb").isNull(),
                F.lit(None).cast("double"),
            )
            .when(
                F.col("_hasa").isNull() | F.col("_hasb").isNull(),
                F.lit(0.0),
            )
            .otherwise(
                F.round(
                    agree.cast("double") / F.lit(float(num_hashes)),
                    round_to,
                )
            )
            .alias("est_wj"),
        )
    )
    totals = tf.groupBy("_src").agg(F.sum("_tf").alias("_tot"))
    shared = (
        tf.select(F.col("_src").alias("source_a"), "_t", F.col("_tf").alias("_fa"))
        .join(
            tf.select(
                F.col("_src").alias("source_b"),
                F.col("_t").alias("_tb"),
                F.col("_tf").alias("_fb"),
            ),
            F.col("_t") == F.col("_tb"),
        )
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.least("_fa", "_fb")).alias("_smin"))
    )
    smin = F.coalesce(F.col("_smin"), F.lit(0)).cast("double")
    denom = (
        F.coalesce(F.col("_ta"), F.lit(0)).cast("double")
        + F.coalesce(F.col("_tb_tot"), F.lit(0)).cast("double")
        - smin
    )
    return (
        est.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .join(
            F.broadcast(
                totals.select(
                    F.col("_src").alias("source_a"), F.col("_tot").alias("_ta")
                )
            ),
            "source_a",
            "left",
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("_src").alias("source_b"),
                    F.col("_tot").alias("_tb_tot"),
                )
            ),
            "source_b",
            "left",
        )
        .select(
            "source_a",
            "source_b",
            "est_wj",
            F.when(denom > 0, F.round(smin / denom, round_to)).alias(
                "exact_wj"
            ),
        )
    )
