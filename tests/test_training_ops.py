"""Semantics tests for the training-data operators (dedup, text,
similarity, media). Engine-vs-DuckDB parity is covered by
tools/check_oracles.py + the driver; these pin behavior on constructed
cases with known answers."""

import pytest
from pyspark.sql import functions as F

from asag_spark.operators.dedup import (
    embedding_near_dups, exact_dedup, jaccard_pairs, lsh_candidate_pairs,
    minhash_dedup, simhash_near_dups,
)
from asag_spark.operators.media import decode_media, extract_media, media_features
from asag_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from asag_spark.operators.text import fingerprint, lang_id, quality_score, token_count


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", "s", 44),  # near dup
        (3, "completely different words entirely here now", "en", "s", 45),
        (4, "el gato y la casa de madrid", "es", "s", 27),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_token_count(corpus):
    r = {x["doc_id"]: x["n_tokens"] for x in token_count(corpus).collect()}
    assert r[0] == 9 and r[4] == 7


def test_fingerprint_and_exact_dedup(corpus):
    fp = {x["doc_id"]: x["fp"] for x in fingerprint(corpus).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]
    groups = {x["fp"]: x for x in exact_dedup(corpus).collect()}
    g = groups[fp[0]]
    assert g["keeper_doc_id"] == 0 and g["n_docs"] == 2


def test_jaccard_and_minhash(corpus):
    jp = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
          jaccard_pairs(corpus, threshold=0.5).collect()}
    assert jp[(0, 1)] == 1.0
    assert 0.5 <= jp[(0, 2)] < 1.0          # one word differs → high overlap
    assert (0, 3) not in jp
    cands = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(corpus).collect()}
    assert (0, 1) in cands                   # identical docs always collide
    verified = {(r["doc_a"], r["doc_b"]) for r in
                minhash_dedup(corpus, threshold=0.5).collect()}
    assert (0, 1) in verified and (0, 3) not in verified


def test_simhash(corpus):
    nd = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
          simhash_near_dups(corpus, max_hamming=10).collect()}
    assert nd[(0, 1)] == 0                   # identical → distance 0


def test_lang_and_quality(corpus):
    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(corpus).collect()}
    assert langs[0] == "en" and langs[4] == "es"
    q = {r["doc_id"]: r for r in quality_score(corpus).collect()}
    assert 0.0 <= q[0]["quality"] <= 1.0
    assert q[0]["stopword_ratio"] > q[3]["stopword_ratio"]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.04, 0.0, 0.0], 0),      # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0, 0.0], 2),
        (4, [0.7, 0.7, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_cosine_topk_exact(vectors):
    out = cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in ranked] == [1, 4]
    assert ranked[0]["cosine"] > 0.99


def test_cosine_topk_lsh_same_bucket(vectors):
    out = cosine_topk_lsh(vectors, vectors.filter(F.col("vec_id") == 0), k=2).collect()
    # bucket of vec 0 = signs(1,0,0,0); vec 3 (-1,...) is excluded by LSH
    assert all(r["neighbor_id"] != 3 for r in out)
    assert any(r["neighbor_id"] == 1 for r in out)


def test_embedding_near_dups(vectors):
    nd = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in
          embedding_near_dups(vectors, threshold=0.95).collect()}
    assert (0, 1) in nd and nd[(0, 1)] > 0.99
    assert all(p == (0, 1) for p in nd)


def test_media_pipeline(spark):
    from asag_spark.datagen import fixture_docs
    from asag_spark.sources import docs_from_documents

    docs = spark.createDataFrame(
        [("d1", [("meta", "entity_type=StopPlace;id=d1;version=1", "", 0),
                 ("media", "", "img://a.jpg", 37),
                 ("media", "", "img://b.jpg", 37)])],
        schema=fixture_docs(spark).schema,
    )
    media = extract_media(docs)
    rows = media.collect()
    assert [(r["media_ref"], r["span_idx"]) for r in rows] == [
        ("img://a.jpg", 1), ("img://b.jpg", 2)
    ]
    dec = decode_media(media).collect()
    assert all(r["is_stub"] for r in dec)
    assert all(r["width"] >= 64 and r["format"] in ("jpeg", "png", "webp") for r in dec)
    # determinism: same ref → same feature
    f = media_features(media.union(media)).collect()
    by_ref = {}
    for r in f:
        by_ref.setdefault(r["media_ref"], set()).add(tuple(r["feature"]))
    assert all(len(v) == 1 for v in by_ref.values())


def test_winnow_fingerprints(corpus):
    from asag_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(corpus).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # exact dups share the full fingerprint set
    assert by_doc[0] == by_doc[1]
    # near dup (one word changed at the end) shares a prefix of windows
    assert by_doc[0] & by_doc[2]
    # unrelated doc shares nothing
    assert not (by_doc[0] & by_doc[3])
    # every doc fingerprinted, values are 16-hex
    assert set(by_doc) == {0, 1, 2, 3, 4}
    assert all(len(f) == 16 for s in by_doc.values() for f in s)


def test_winnow_short_doc_fallback(spark):
    from asag_spark.operators.text import winnow_fingerprints

    rows = [(0, "one two", "en", "s", 7), (1, "one two", "en", "s", 7),
            (2, "a b c d e f", "en", "s", 11)]  # 6 toks -> 2 shingles < w
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] == by_doc[1] and len(by_doc[0]) == 1
    assert len(by_doc[2]) == 1  # global-min branch
