"""Multimodal operator tests: stub gating, determinism, batch shape."""

from __future__ import annotations

import hashlib

import pytest

from hfp_loader_spark.operators.multimodal import (
    decode_and_sample_frames,
    decode_payload,
    extract_features,
    with_binary_payload,
)
from hfp_loader_spark.plans.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return with_binary_payload(load_table(spark, sf_dir, "documents"))


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x01", "image")


def test_fake_decode_is_deterministic_and_typed():
    a = decode_payload(b"same bytes", "image", fake=True)
    b = decode_payload(b"same bytes", "image", fake=True)
    assert a == b
    assert set(a) == {"media_type", "width", "height", "n_channels", "n_frames"}
    assert a["width"] >= 16 and a["n_frames"] >= 1


def test_extract_features_matches_python(docs):
    got = {r["doc_id"]: r for r in extract_features(docs).collect()}
    for row in docs.select("doc_id", "text", "payload").limit(20).collect():
        b = bytes(row["payload"])
        assert b == row["text"].encode("utf-8")  # payload contract
        r = got[row["doc_id"]]
        assert r["n_bytes"] == len(b)
        assert r["md5_hex"] == hashlib.md5(b).hexdigest()
        assert r["first_byte"] == b[0]
        assert r["mean_byte"] == sum(b) // len(b)


def test_resize_contract(docs):
    from hfp_loader_spark.operators.multimodal import resize_images

    out = resize_images(docs, 8, 8).limit(20).collect()
    for r in out:
        assert len(r["resized"]) == 64
        assert r["target_width"] == 8 and r["target_height"] == 8
        assert set(r["meta"].asDict()) == {
            "media_type",
            "width",
            "height",
            "n_channels",
            "n_frames",
        }

    # deterministic fake: nearest-neighbor sample of the payload bytes
    row = docs.select("doc_id", "payload").first()
    b = bytes(row["payload"])
    expect = bytes(b[(i * len(b)) // 64] for i in range(64))
    got = {r["doc_id"]: bytes(r["resized"]) for r in out}
    if row["doc_id"] in got:
        assert got[row["doc_id"]] == expect


def test_audio_features_match_python(docs):
    from hfp_loader_spark.operators.multimodal import audio_features

    got = {r["doc_id"]: r for r in audio_features(docs).collect()}
    for row in docs.select("doc_id", "payload").limit(20).collect():
        b = bytes(row["payload"])
        if not b:
            continue
        x = [v - 128 for v in b]
        r = got[row["doc_id"]]
        assert r["n_samples"] == len(x)
        assert r["n_windows"] == -(-len(x) // 256)
        assert r["zero_crossings"] == sum(
            1 for i in range(1, len(x)) if (x[i] >= 0) != (x[i - 1] >= 0)
        )
        assert r["peak"] == max(abs(v) for v in x)
        import math

        assert r["rms"] == format(
            math.sqrt(sum(v * v for v in x) / len(x)), ".4f"
        )


def test_frame_sampling_shape(docs):
    out = decode_and_sample_frames(docs, n_samples=4).collect()
    assert len(out) == docs.count()
    for r in out[:20]:
        n = len(r["frame_offsets"])
        assert 1 <= n <= 4
        assert len(r["frame_digests"]) == n
        assert r["meta"]["n_frames"] >= n
        assert sorted(r["frame_offsets"]) == list(r["frame_offsets"])


def test_multimodal_oracles_hold_for_non_ascii_text(spark, tmp_path):
    """The multimodal oracles are byte-restated via hex(encode(text)), so
    they must keep hash-matching when the corpus contains multibyte text.
    Earlier rounds asserted the corpus was ASCII instead — this replays
    the driver's Spark-vs-DuckDB comparison on a deliberately non-ASCII
    fixture so a future driver regeneration can't silently break the
    encoding contract."""
    import duckdb
    import pandas as pd

    from hfp_loader_spark.plans.catalog import REGISTRY

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "héllo wörld — naïve façade",  # latin multibyte
                "данные и ещё данные",  # cyrillic
                "日本語のテキスト 🚀",  # CJK + astral emoji
                "plain ascii stays supported",
            ],
            "lang": ["fr", "ru", "ja", "en"],
            "source": ["t"] * 4,
            "n_chars": [26, 19, 10, 27],
        }
    )
    sf = tmp_path / "nonascii_sf"
    sf.mkdir()
    rows.to_parquet(sf / "documents.parquet", index=False)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf / 'documents.parquet'}')"
    )
    for name in (
        "multimodal_byte_features",
        "multimodal_decode_frames",
        "multimodal_audio_features",
        "multimodal_resize",
    ):
        spec = REGISTRY[name]
        spark_rows = spec.builder(spark, str(sf)).collect()
        cols = spark_rows[0].asDict().keys()
        got = sorted(
            tuple(str(r[c]) for c in sorted(cols)) for r in spark_rows
        )
        odf = con.execute(spec.oracle).fetchdf()
        want = sorted(
            tuple(str(v) for v in row)
            for row in odf[sorted(odf.columns)].itertuples(index=False)
        )
        assert sorted(odf.columns) == sorted(cols), name
        assert got == want, f"{name} diverged on non-ASCII text"


def test_blockhash_locality_and_exactness(spark):
    """Identical payloads → identical hashes; a small byte edit → small
    Hamming distance; a very different payload → large distance."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.multimodal import (
        blockhash_fingerprints,
        with_binary_payload,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base.replace("quick", "quack", 1)
    different = "zzzz!!!!0000" * 40
    docs = with_binary_payload(
        spark.createDataFrame(
            [(1, base), (2, base), (3, edited), (4, different), (5, "")],
            "doc_id long, text string",
        )
    )
    fp = {r["doc_id"]: r["phash"] for r in blockhash_fingerprints(docs).collect()}
    assert 5 not in fp  # empty payload dropped
    assert fp[1] == fp[2]
    near = bin(fp[1] ^ fp[3]).count("1")
    far = bin(fp[1] ^ fp[4]).count("1")
    assert near <= 6
    assert far > 15
    # the banded pair join finds the exact-dup pair at hamming 0
    from hfp_loader_spark.operators.neardup import simhash_near_pairs

    pairs = simhash_near_pairs(
        blockhash_fingerprints(docs).select(
            "doc_id", F.col("phash").alias("simhash")
        ),
        max_hamming=3,
    ).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs} >= {
        (1, 2, 0)
    }
