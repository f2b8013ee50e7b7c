"""Byte-pair-encoding tokenizer TRAINING as unrolled Catalyst plans
(extension tier; the reference has no text surface — SURVEY §2.11).

Classic word-level BPE (Sennrich et al. 2016, the public algorithm every
subword tokenizer descends from): pre-tokenize the corpus into words,
count word frequencies, split words into character symbols, then N
times (a) count adjacent symbol pairs weighted by word frequency,
(b) merge the most frequent pair everywhere, greedily left-to-right
within each word.  The learned artifact is the ordered MERGE TABLE —
apply it in order and you have the tokenizer.

Spark shape: the corpus is touched ONCE (tokenize → word counts); all N
merge rounds run over the bounded (distinct-word, freq, symbols) vocab
frame — the same corpus-once/iterate-on-bounded-state shape as the
fixed-point k-means trilogy.  Each round is: one explode+aggregate for
pair counts, one ``TakeOrderedAndProject`` argmax (count desc, pair
asc — fully deterministic ties), and one expression-only greedy rebuild
of every word's symbol array (an ``F.aggregate`` fold — no UDF, no
shuffle).  The argmax row is LEFT-joined back (a 1-row broadcast), so a
corpus that runs out of pairs degrades to fewer merges, never to an
annihilated vocab.

Exactness: every step is integer counts + lexicographic ties, so the
whole training replays in SQL.  The oracle uses an INDEPENDENT
formulation of the greedy merge (gaps-and-islands parity over exploded
symbol positions — adjacent overlapping matches only exist when
left==right, and greedy-from-the-left keeps islands' odd offsets),
which strengthens the check: two different derivations of the same
recurrence must agree bit-for-bit.

Greedy-fold correctness note: the fold merges ``x`` into ``out[-1]``
iff ``out[-1] == left and x == right``; a symbol just CREATED by a
this-round merge can never false-positive as ``left`` because
``left || right == left`` would need an empty ``right``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars_of(word: Column) -> Column:
    """Split a word into single-character symbols (code-point slices —
    identical semantics to the oracle's ``word[i:i]``)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _greedy_merge(syms: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of the (left, right) pair inside one
    symbol array — an expression-only fold; NULL left/right (no pair
    survived this round) is the identity."""
    step = lambda out, x: F.when(  # noqa: E731 — local fold step
        (F.size(out) > 0)
        & (F.element_at(out, -1) == left)
        & (x == right),
        F.concat(
            F.slice(out, 1, F.size(out) - 1),
            F.array(F.concat(left, right)),
        ),
    ).otherwise(F.concat(out, F.array(x)))
    return F.aggregate(
        syms, F.array().cast("array<string>"), step
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r2>> of adjacent symbol pairs (empty for 1-symbol
    words — guarded against F.sequence's descending-range surprise)."""
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r2:string>>"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus;
    returns the ordered merge table
    ``(merge_rank, pair_left, pair_right, pair_count)`` — ≤ n_merges
    rows (fewer iff the vocabulary runs out of pairs).

    Scale: the corpus contributes one tokenize+count pass; rounds
    iterate on the distinct-word frame (vocab-bounded, lazily
    localCheckpointed ONCE per round so plan depth stays linear).
    Optimization r17: the winning pair rides the vocab checkpoint as
    three constant columns instead of being checkpointed separately —
    r16's two pins per round meant two sequential plan-finalization
    barriers on the driver (each ``localCheckpoint`` materializes its
    AQE stages), and the bench showed the 6-merge entry spending most
    of its wall there; one pin per round halves the barriers while
    keeping exactly ONE pair-count aggregate per round (recomputing
    ``best`` for the output would have doubled the vocab-sized pass at
    scale).  The merge row is recovered from any vocab row (the joined
    pair columns are identical on every row); a pair-less round leaves
    them NULL on every row, so the rank degrades to no output row
    exactly as before."""
    from hfp_loader_spark.operators.relational import global_top_k
    from hfp_loader_spark.operators.text import tokens

    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    vocab = words.select(
        "word", "freq", chars_of(F.col("word")).alias("syms")
    ).localCheckpoint(eager=False)

    merge_frames = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r2").alias("r2"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = global_top_k(
            pairs, [F.desc("cnt"), F.asc("l"), F.asc("r2")], 1
        )
        vocab = (
            vocab.join(F.broadcast(best), F.lit(True), "left")
            .select(
                "word",
                "freq",
                _greedy_merge(
                    F.col("syms"), F.col("l"), F.col("r2")
                ).alias("syms"),
                "l",
                "r2",
                "cnt",
            )
            .localCheckpoint(eager=False)
        )
        merge_frames.append(
            vocab.where(F.col("l").isNotNull())
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("pair_left"),
                F.col("r2").alias("pair_right"),
                F.col("cnt").alias("pair_count"),
            )
        )
        vocab = vocab.select("word", "freq", "syms")
    out = merge_frames[0]
    for mf in merge_frames[1:]:
        out = out.unionByName(mf)
    return out


def bpe_segment(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """APPLY a learned merge table: segment each word into subword
    pieces by replaying the merges IN RANK ORDER (the defining
    tokenizer semantics) — each merge is the same expression-only
    greedy fold training used, with the pair as plan literals, so
    segmenting is one narrow no-shuffle projection however many rows
    stream through.  ``merges`` is the ordered
    ``[(pair_left, pair_right), …]`` list (collect the bounded
    :func:`bpe_train` output — the tokenizer model is driver-sized by
    definition)."""
    syms = chars_of(F.col(word_col))
    for left, right in merges:
        syms = _greedy_merge(syms, F.lit(left), F.lit(right))
    return words.withColumn(out_col, syms)
