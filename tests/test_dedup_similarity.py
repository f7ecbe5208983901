"""Unit tests for dedup / similarity / text-analysis functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logdata_anomaly_miner_spark.functions.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
)
from logdata_anomaly_miner_spark.functions.similarity import (
    cosine_topk,
    exact_near_dup_pairs,
    lsh_bucket_topk,
)
from logdata_anomaly_miner_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),       # exact dup of 1
    (3, "The quick brown fox jumps over the lazy dog!!"),     # normalized dup of 1
    (4, "the quick brown fox leaps over the lazy dog"),       # near dup (1 word)
    (5, "completely different text about spark dataframes here"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dup_groups(spark):
    out = exact_dup_groups(_docs(spark), "doc_id", "text").collect()
    assert len(out) == 1
    assert sorted(out[0]["doc_ids"]) == [1, 2, 3]  # normalization folds 3 in


def test_minhash_lsh_finds_near_dups(spark):
    sig = minhash_signatures(_docs(spark), "doc_id", "text", n_hashes=16, shingle_k=3)
    assert sig.count() == 5 * 16
    # identical docs share identical signatures
    s = {(r["doc_id"], r["seed"]): r["minhash"] for r in sig.collect()}
    assert all(s[(1, k)] == s[(2, k)] for k in range(16))
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sig, "doc_id").collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(5 in p for p in pairs)
    # the jaccard~0.4 pair (1,4) is below these banding parameters' reliable
    # recall (sim^rows per band) — the exact inverted-index path finds it:
    verified = ngram_jaccard_pairs(_docs(spark), None, "doc_id", "text", 3, 0.3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert got[(1, 2)] == 1.0
    assert 0.3 <= got[(1, 4)] < 1.0


def test_fused_minhash_banding_matches_two_step(spark):
    """minhash_lsh_candidates (r8 fused path — buckets projected straight
    off the wide aggregation) must emit exactly the candidate set of the
    unfused minhash_signatures(_xx) -> lsh_candidate_pairs pipeline: the
    band bucket md5 input string is identical by construction, for both
    hash families."""
    from logdata_anomaly_miner_spark.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures_xx,
    )

    docs = _docs(spark)
    for use_xx, nh, bands, rpb in [(False, 16, 4, 4), (True, 30, 10, 3)]:
        sig = (
            minhash_signatures_xx(docs, "doc_id", "text", n_hashes=nh, shingle_k=3)
            if use_xx
            else minhash_signatures(docs, "doc_id", "text", n_hashes=nh, shingle_k=3)
        )
        two_step = {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(
                sig, "doc_id", bands=bands, rows_per_band=rpb
            ).collect()
        }
        fused = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(
                docs, "doc_id", "text", n_hashes=nh, shingle_k=3,
                bands=bands, rows_per_band=rpb, use_xx=use_xx,
            ).collect()
        }
        assert fused == two_step and fused


def test_jaccard_shingle_df_cap(spark):
    """A planted stop-shingle shared by EVERY doc must not drive candidate
    generation when max_shingle_df is set: pairs overlapping only on the
    stop phrase disappear (bounding the index self-join), while genuine
    near-dups keep their EXACT jaccard (intersection still counts all
    shingles, including capped ones)."""
    stop = " lorem ipsum dolor sit amet"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog" + stop),
        (2, "the quick brown fox jumps over the lazy dog" + stop),
        (3, "a completely different document body here" + stop),
        (4, "yet another unrelated piece of text content" + stop),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, None, "doc_id", "text", 3, 0.01).collect()
    }
    # without the cap the stop phrase makes EVERY pair a candidate
    assert uncapped == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, None, "doc_id", "text", 3, 0.01, max_shingle_df=2
        ).collect()
    }
    # stop-shingle-only pairs are gone; the true near-dup pair survives
    assert set(capped) == {(1, 2)}
    assert capped[(1, 2)] == 1.0  # exact jaccard, capped shingles included


def test_simhash_near_dups(spark):
    sim = simhash64(_docs(spark), "doc_id", "text")
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[1] == vals[2]
    nd = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(sim, max_hamming=10).collect()}
    assert nd[(1, 2)] == 0
    assert (1, 4) in nd  # near dup within hamming 10
    assert not any(5 in p for p in nd)


def test_cosine_topk_and_lsh(spark):
    rows = [(i, [1.0, 0.0] if i < 3 else [0.0, 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = cosine_topk(df, "embedding", [1.0, 0.0], k=3)
    assert [r["vec_id"] for r in top.collect()] == [0, 1, 2]
    assert all(r["cosine"] == 1.0 for r in top.collect())
    lsh = lsh_bucket_topk(df, "embedding", [1.0, 0.0], k=3, n_planes=6)
    assert {r["vec_id"] for r in lsh.collect()} <= {0, 1, 2}


def test_exact_near_dup_pairs_blas(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0]), (3, [0.01, 0.999])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           exact_near_dup_pairs(spark, df, threshold=0.9).collect()}
    assert set(out) == {(0, 1), (2, 3)}
    assert all(v > 0.99 for v in out.values())


def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame([("hello world, 42 times!",)], "text string")
    r = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    assert r["ws"] == 4            # hello / world, / 42 / times!
    assert r["bpe"] == 6           # hello world , 42 times !
    want = sum(ord(c) * (i + 1) for i, c in enumerate("hello world, 42 times!")) % 1_000_000_007
    assert r["fp"] == want

def test_ivf_topk_recall(spark):
    """IVF ANN: on well-separated clusters the probe set covers the query's
    neighborhood, so the top-k equals the exact scan's."""
    import random

    from logdata_anomaly_miner_spark.functions.similarity import cosine_topk, ivf_topk

    rng = random.Random(5)
    rows = []
    centers = [(10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)]
    for i in range(240):
        cx = centers[i % 3]
        rows.append((i, [c + rng.uniform(-1, 1) for c in cx]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = [10.0, 0.5, 0.0]
    exact = [r["vec_id"] for r in cosine_topk(df, "embedding", query, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(
            spark, df, "embedding", query, k=10, n_centroids=6, n_probe=3
        ).collect()
    ]
    assert approx == exact


def test_connected_components_vs_union_find(spark):
    """Alternating large-star/small-star components match a plain-Python
    union-find on a seeded random graph plus a long path (the path forces
    multiple rounds — a one-round-converging test would not exercise the
    alternation)."""
    import random

    from logdata_anomaly_miner_spark.functions.dedup import (
        connected_components,
        dup_clusters,
    )

    rng = random.Random(42)
    edges = [(f"d{rng.randrange(120):03d}", f"d{rng.randrange(120):03d}") for _ in range(90)]
    edges += [(f"p{i:03d}", f"p{i+1:03d}") for i in range(40)]  # path of 41 nodes
    edges = [(a, b) for a, b in edges if a != b]

    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical: min member per component
    members: dict[str, list[str]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    expected = {n: min(members[find(n)]) for n in parent}

    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected

    clusters = {
        r["component"]: r["n_members"] for r in dup_clusters(pairs).collect()
    }
    assert clusters == {c: len(ms) for c, ms in members.items()}
    # the 41-node path collapsed into one cluster rooted at p000
    assert clusters["p000"] == 41
