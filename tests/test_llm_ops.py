"""Invariant tests for the hash-based LLM ops (no SQL oracle possible):
MinHash-LSH recall vs exact Jaccard, SimHash behavior on planted
duplicates, ANN recall vs the brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.operators import dedup as D
from dais2021imageprocessingondeltalake_spark.operators import similarity as SIM

from .conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates must recover most true near-dup pairs (Jaccard >=
    0.5 pairs collide w.p. ~1-(1-0.5^4)^8 = 0.42 per band config; at the
    0.2-threshold ground truth we assert recall on the high-sim subset)."""
    docs = load_table(spark, "documents", SF_DIR)
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(docs, "doc_id", num_hashes=32, bands=8).collect()
    }
    if truth:
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.5, f"LSH recall {recall} over {len(truth)} true pairs"


def test_minhash_identical_docs_always_collide(spark):
    """Planted exact duplicates must be LSH candidates with est_jaccard=1."""
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words entirely unrelated content here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.minhash_lsh_pairs(df, "doc_id", num_hashes=16, bands=4).collect()
    found = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    assert (1, 2) in found and found[(1, 2)] == 1.0


def test_simhash_identical_zero_hamming(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words entirely unrelated content here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_near_pairs(df, "doc_id", max_hamming=12).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs or pairs[(1, 3)] > 0


def test_drop_exact_duplicates(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in D.drop_exact_duplicates(df, "doc_id").collect())
    assert kept == [1, 3]  # min id canonical


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in SIM.lsh_ann_topk(emb, qv, k=10, n_planes=6).collect()]
    # query vector itself is its own nearest neighbor
    assert exact[0] == 0 and approx[0] == 0
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"ANN recall@10 = {recall}"


def test_embedding_near_dup_planted(spark):
    """A vector duplicated exactly must be found at cosine ~1."""
    emb = load_table(spark, "embeddings", SF_DIR)
    clone = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(99999).cast("bigint"))
    with_dup = emb.unionByName(clone)
    pairs = SIM.embedding_near_dup(with_dup, threshold=0.999, n_planes=10, dim=64).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 99999 for r in pairs)


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = SIM.ivf_fit_centroids(emb, n_centroids=8)
    exact = [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in SIM.ivf_ann_topk(emb, qv, cents, k=10, n_probe=3).collect()]
    assert approx[0] == 0  # query vector found in its own list
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"IVF recall@10 = {recall}"


def test_ivf_assignment_partitions_all_rows(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    cents = SIM.ivf_fit_centroids(emb, n_centroids=8)
    assigned = SIM.ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.filter(F.col("centroid_id").between(0, 7)).count() == n


def test_short_docs_produce_no_shingle_pairs(spark):
    """Docs shorter than the shingle width must yield zero shingles (and
    thus no pairs) — matching the SQL oracle's range-based shingling,
    which is empty for len(w) < n."""
    rows = [(1, "one two"), (2, "one two"), (3, "a b c d e f g")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs(df, "doc_id", n=3, threshold=0.1).collect()
    assert pairs == []  # the two identical 2-token docs must NOT pair
    sigs = D.minhash_signatures(df, "doc_id", num_hashes=8).collect()
    assert {r["doc_id"] for r in sigs} == {3}  # shingle-less docs have no signature


def test_prefix_filter_jaccard_equals_naive(spark):
    """PPJoin-style prefix filtering is an EXACT algorithm: at any
    threshold it must return precisely the pairs the inverted-index form
    returns (prefix pruning may only drop candidates that verification
    would reject anyway)."""
    docs = load_table(spark, "documents", SF_DIR)
    for t in (0.2, 0.5, 0.8):
        naive = set(
            map(tuple, D.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=t)
                .select("doc_a", "doc_b", "shared").collect())
        )
        pref = set(
            map(tuple, D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=t)
                .select("doc_a", "doc_b", "shared").collect())
        )
        assert pref == naive, f"threshold {t}: prefix {len(pref)} vs naive {len(naive)}"


def test_prefix_filter_handles_short_docs(spark):
    """Sub-shingle-width docs vanish before the prefix join (no empty-set
    division, no spurious pairs)."""
    rows = [(1, "one two"), (2, "one two"), (3, "a b c d e f g"), (4, "a b c d e f g")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs_prefix(df, "doc_id", n=3, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs] == [(3, 4, 1.0)]


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation must label every member of a component with
    the component's minimum id — including multi-hop chains (the case a
    single join round would get wrong)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["id"]: r["cluster_root"]
        for r in D.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_image_near_dup_finds_planted_variants(spark):
    """Every planted variant must pair with exactly its base image (the
    corner-block edit flips few aHash bits); unrelated textured bases
    must not collide at max_hamming=8."""
    from dais2021imageprocessingondeltalake_spark import queries_all as q

    pairs = {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in q.REGISTRY["q_image_near_dup"].fn(spark, SF_DIR).collect()
    }
    from dais2021imageprocessingondeltalake_spark.sources.fixtures import TEXTURED_VARIANTS

    for i in range(TEXTURED_VARIANTS):
        key = tuple(sorted([f"base_{i}.png", f"variant_{i}.png"]))
        assert key in pairs, f"variant pair {key} missing: {sorted(pairs)}"
    for (a, b), h in pairs.items():
        assert a.split("_")[1].split(".")[0] == b.split("_")[1].split(".")[0], (
            f"false positive: {a} ~ {b} at hamming {h}"
        )


def test_connected_components_nonconvergence_signal(spark):
    """A component whose diameter exceeds max_iter is only partially
    labeled — the operator must raise (default) or warn, never silently
    return split clusters."""
    import warnings

    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iter=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        partial = D.connected_components(chain, max_iter=2, on_nonconverge="warn")
        assert partial.count() == 8
    assert any("did not converge" in str(w.message) for w in caught)


def test_dup_span_coverage_planted(spark):
    """Two identical docs share every shingle (coverage 1.0); a disjoint
    doc shares none (0.0); a half-overlapping doc scores in between."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),
        (3, "q r s t u v"),
        (4, "a b c d x y z w"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from dais2021imageprocessingondeltalake_spark.operators.text import (
        duplicate_span_coverage,
    )

    got = {r["doc_id"]: r for r in duplicate_span_coverage(df, "doc_id", n=3).collect()}
    assert got[1]["dup_coverage"] == 1.0 and got[2]["dup_coverage"] == 1.0
    assert got[3]["dup_coverage"] == 0.0
    # doc 4: shingles 'a b c','b c d' duplicated out of 6 total
    assert got[4]["n_shingles"] == 6 and got[4]["n_duplicated"] == 2


def test_unigram_logprob_orders_rarity(spark):
    """A doc of corpus-frequent tokens must outscore a doc of rare ones."""
    rows = [
        (1, "common common common common"),
        (2, "common common common common"),
        (3, "rareword1 rareword2 rareword3 rareword4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from dais2021imageprocessingondeltalake_spark.operators.text import (
        unigram_logprob_score,
    )

    got = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob_score(df).collect()}
    assert got[1] > got[3]


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized vectors must sit within scale/2 per component, and the
    quantized cosine must stay close to the full-precision one."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.similarity import (
        dequantize_embeddings_int8,
        quantize_embeddings_int8,
    )

    emb = load_table(spark, "embeddings", SF_DIR).limit(50)
    q = quantize_embeddings_int8(emb)
    dq = dequantize_embeddings_int8(q)
    rows = dq.select("embedding", "embedding_dq", "q8_scale").collect()
    assert rows
    for r in rows:
        orig = [float(x) for x in r["embedding"]]
        recon = r["embedding_dq"]
        bound = r["q8_scale"] / 2 + 1e-12
        assert all(abs(a - b) <= bound for a, b in zip(orig, recon))


def test_quantized_ann_recall_vs_exact(spark):
    """The int8 coarse stage + full-precision re-rank must recover most
    of the exact top-10 (coarse error is bounded by quantization scale,
    and the 5x shortlist absorbs rank perturbations)."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.similarity import (
        cosine_topk,
        quantized_ann_topk,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in quantized_ann_topk(emb, qv, k=10, shortlist=50).collect()}
    assert len(exact & approx) >= 8


def test_operators_tolerate_empty_input(spark):
    """Every corpus-statistics operator must return an empty, correctly
    typed frame on empty input — no crashes in the bounds/agg/checkpoint
    machinery (the first batch of a new pipeline IS often empty)."""
    from pyspark.sql import types as T

    from dais2021imageprocessingondeltalake_spark.operators.similarity import (
        quantize_embeddings_int8,
    )
    from dais2021imageprocessingondeltalake_spark.operators.temporal import gap_fill
    from dais2021imageprocessingondeltalake_spark.operators.text import (
        duplicate_span_coverage,
        tfidf_vectors,
        top_ngrams_per_group,
        unigram_logprob_score,
    )

    empty_docs = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    assert tfidf_vectors(empty_docs).count() == 0
    assert duplicate_span_coverage(empty_docs).count() == 0
    assert unigram_logprob_score(empty_docs).count() == 0
    assert top_ngrams_per_group(empty_docs, "lang").count() == 0

    edges = spark.createDataFrame(
        [], T.StructType([T.StructField("doc_a", T.LongType()), T.StructField("doc_b", T.LongType())])
    )
    assert D.connected_components(edges).count() == 0
    assert D.ngram_jaccard_pairs_prefix(empty_docs, "doc_id").count() == 0

    empty_emb = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    assert quantize_embeddings_int8(empty_emb).count() == 0

    empty_ev = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    assert gap_fill(empty_ev, "k", "ts", F.sum("v")).count() == 0

    from dais2021imageprocessingondeltalake_spark.operators.aggregates import sketch_rollup
    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_apply_history,
        scd2_from_history,
    )

    empty_hist = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    assert scd2_from_history(empty_hist, key="id", ts="ts", attr="v").count() == 0
    # empty batch folded into a real dimension: pass-through unchanged
    from datetime import datetime

    dim = scd2_from_history(
        spark.createDataFrame(
            [(1, datetime(2024, 1, 1), "a")], "id long, ts timestamp, v string"
        ),
        key="id", ts="ts", attr="v",
    )
    folded = scd2_apply_history(dim, empty_hist, key="id", ts="ts", attr="v")
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, dim.collect()))
    assert sketch_rollup(empty_ev, "k", F.lit(1), "k").count() == 0


def test_connected_components_long_chain_log_rounds(spark):
    """Pointer jumping makes convergence O(log diameter): a 120-node
    chain (diameter 119) must fully merge within the default max_iter=25
    — impossible for plain per-round min propagation, which needs one
    round per hop."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["doc_a", "doc_b"]
    )
    out = D.connected_components(edges).collect()
    assert len(out) == 121
    assert all(r["cluster_root"] == 0 for r in out)


def test_leakage_safe_split_invariants(spark):
    """No near-dup pair may straddle the split; assignment is
    deterministic under reruns; both sides are populated and the train
    fraction is roughly honored; every doc appears exactly once."""
    from dais2021imageprocessingondeltalake_spark import queries_all as q

    out = q.REGISTRY["q_leakage_safe_split"].fn(spark, SF_DIR)
    rows = out.collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert len(rows) == n_docs
    side = {r["doc_id"]: r["split"] for r in rows}
    docs = load_table(spark, "documents", SF_DIR)
    pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
    for p in pairs.collect():
        assert side[p["doc_a"]] == side[p["doc_b"]], (p["doc_a"], p["doc_b"])
    again = {
        r["doc_id"]: r["split"]
        for r in q.REGISTRY["q_leakage_safe_split"].fn(spark, SF_DIR).collect()
    }
    assert side == again
    n_train = sum(1 for v in side.values() if v == "train")
    assert 0.6 < n_train / n_docs < 0.95


class TestKeepBestPerCluster:
    def test_highest_quality_survives(self, spark):
        """Keep-best picks the cleanest member even when it has the
        LARGER id — the distinction from min-id canon."""
        from dais2021imageprocessingondeltalake_spark.operators import dedup as D

        scored = spark.createDataFrame(
            [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.7)],
            ["doc_id", "q_score"],
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 3)],  # {1,2} one cluster; 3 clustered alone
            ["id", "cluster_root"],
        )
        out = {
            r.doc_id: (r.cluster_root, r.q_score)
            for r in D.keep_best_per_cluster(scored, clusters, "doc_id", "q_score").collect()
        }
        # cluster {1,2}: doc 2 (0.9) beats doc 1 (0.2) despite larger id
        assert set(out) == {2, 3, 9}
        assert out[2] == (1, 0.9)
        assert out[9] == (9, 0.7)  # singleton (absent from clusters) survives

    def test_tie_breaks_to_min_id(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators import dedup as D

        scored = spark.createDataFrame([(5, 0.5), (6, 0.5)], ["doc_id", "q_score"])
        clusters = spark.createDataFrame([(5, 5), (6, 5)], ["id", "cluster_root"])
        out = D.keep_best_per_cluster(scored, clusters, "doc_id", "q_score").collect()
        assert [(r.doc_id, r.cluster_root) for r in out] == [(5, 5)]


class TestLshKnnJoin:
    def test_recall_vs_exact(self, spark):
        """On the synthetic near-RANDOM embeddings (no cluster structure,
        neighbor cosines ~0.3) sign-LSH recall is intrinsically modest —
        bound it above chance; the planted test below covers the regime
        LSH is actually built for (true near-neighbors)."""
        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            knn_join,
            lsh_knn_join,
        )
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_DIR)
        probe = F.col("vec_id") % 97 == 0
        exact = {
            (r.probe_id, r.nbr_id)
            for r in knn_join(emb, k=3, probe_filter=probe).collect()
        }
        approx = {
            (r.query_id, r.base_id)
            for r in lsh_knn_join(
                emb.filter(probe), emb.filter(~probe), dim=64, k=3, n_planes=6
            ).collect()
        }
        # exact allows self-set neighbors from the probe side; restrict to
        # base-side pairs for a fair comparison. Chance level: each query
        # returns 3 of ~495 base ids → ~0.006 expected overlap.
        exact_base = {(a, b) for a, b in exact if b % 97 != 0}
        assert len(approx & exact_base) / max(len(exact_base), 1) >= 0.4

    def test_planted_neighbors_perfect_recall(self, spark):
        """True near-duplicates of a query vector agree on every sign bit
        w.h.p. → the bucketed join must return exactly them."""
        import random

        from dais2021imageprocessingondeltalake_spark.operators.similarity import lsh_knn_join

        rng = random.Random(3)
        anchor = [rng.gauss(0.0, 1.0) for _ in range(64)]
        jitter = lambda v, eps: [x + rng.gauss(0.0, eps) for x in v]
        queries = [(0, anchor)]
        base = (
            # 3 planted near-neighbors of the anchor
            [(i, jitter(anchor, 0.01)) for i in (101, 102, 103)]
            # far-away noise
            + [(200 + i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(30)]
        )
        qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])
        bdf = spark.createDataFrame(base, ["vec_id", "embedding"])
        out = lsh_knn_join(qdf, bdf, dim=64, k=3, n_planes=6)
        assert {r.base_id for r in out.collect()} == {101, 102, 103}

    def test_k_bound_and_no_self(self, spark):
        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import lsh_knn_join
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_DIR)
        out = lsh_knn_join(
            emb.filter(F.col("vec_id") % 97 == 0),
            emb.filter(F.col("vec_id") % 97 != 0),
            dim=64, k=3, n_planes=6,
        )
        per_q = out.groupBy("query_id").count().collect()
        assert all(r["count"] <= 3 for r in per_q)
        assert out.filter(F.col("query_id") == F.col("base_id")).count() == 0

    def test_pq_knn_join_recall_beats_lsh_sibling(self, spark):
        """The compressed-domain join against the exact reference (the
        lsh_knn_join recall test's setup): ADC top-C + exact re-rank
        should recover most of the true top-3 — measured well above the
        LSH sibling's 0.4 floor on the same far-neighbor geometry."""
        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            knn_join,
            pq_knn_join,
        )
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_DIR)
        probe = F.col("vec_id") % 97 == 0
        exact = {
            (r.probe_id, r.nbr_id)
            for r in knn_join(emb, k=3, probe_filter=probe).collect()
        }
        out = pq_knn_join(
            emb.filter(probe), emb.filter(~probe), dim=64, k=3, m=16,
            k_codes=16, iters=1,
        )
        approx = {(r.query_id, r.base_id) for r in out.collect()}
        per_q = {}
        for q, _ in approx:
            per_q[q] = per_q.get(q, 0) + 1
        assert all(c <= 3 for c in per_q.values())
        exact_base = {(a, b) for a, b in exact if b % 97 != 0}
        recall = len(approx & exact_base) / max(len(exact_base), 1)
        assert recall >= 0.8, f"pq_knn_join recall {recall:.2f}"

    def test_ivfadc_knn_join_recall_and_asset_reuse(self, spark):
        """The cell-pruned serving join (r8): same output contract as
        pq_knn_join, kNN recall vs the exact join holding >= 0.7 while
        scanning only ~half the cells; and the persisted-asset path
        (centroids + base codebook/codes passed in) must be
        row-identical to the self-computing path."""
        import math

        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            ivfadc_knn_join,
            knn_join,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        probe = F.col("vec_id") % 97 == 0
        qdf = emb.filter(probe).localCheckpoint()
        bdf = emb.filter(~probe).localCheckpoint()
        exact = {
            (r.probe_id, r.nbr_id)
            for r in knn_join(emb, k=3, probe_filter=probe).collect()
            if r.nbr_id % 97 != 0
        }
        out = ivfadc_knn_join(
            qdf, bdf, dim=64, k=3, m=16, k_codes=16, iters=1
        ).collect()
        approx = {(r.query_id, r.base_id) for r in out}
        per_q = {}
        for q, _ in approx:
            per_q[q] = per_q.get(q, 0) + 1
        assert all(c <= 3 for c in per_q.values())
        recall = len(approx & exact) / max(len(exact), 1)
        assert recall >= 0.7, f"ivfadc_knn_join recall {recall:.2f}"
        # persisted-asset path: precompute quantizer + code index
        kc = math.isqrt(bdf.count() - 1) + 1
        _, cents = SIM.kmeans_fit_distributed(bdf, k=kc, iters=1, round_dp=6)
        bnorm = SIM.normalize_rounded(bdf, out_col="__nv").localCheckpoint()
        book = SIM.pq_fit(bnorm, dim=64, m=16, k_codes=16, iters=1, vec_col="__nv")
        codes = SIM.pq_encode(bnorm, book, dim=64, m=16, vec_col="__nv")
        reused = ivfadc_knn_join(
            qdf, bdf, dim=64, k=3, m=16, k_codes=16, iters=1,
            centroids=cents, base_codebook=book, base_codes=codes,
        ).collect()
        key = lambda r: (r.query_id, r.base_id, r.cosine_sim)
        assert sorted(map(key, reused)) == sorted(map(key, out))

    def test_disjoint_index_keeps_full_shortlist(self, spark):
        """Review r7: the scan's cap must be min(C, |index|), never
        |index|-1 — the self row is excluded by MASK, and a DISJOINT
        index (kNN join, xcorpus) has no self row at all. Worst case:
        a 1-row base must still be every query's top-1 (the old cap
        made keep_top 0 and returned ZERO rows); and a |ref| <=
        shortlist xcorpus index must emit every valid candidate."""
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            pq_knn_join,
        )

        qdf = spark.createDataFrame(
            [(i, "a", [float((i * 7 + j) % 5 - 2) for j in range(64)]) for i in range(6)],
            ["vec_id", "label", "embedding"],
        )
        bdf = spark.createDataFrame(
            [(100, "b", [1.0] * 64)], ["vec_id", "label", "embedding"]
        )
        out = pq_knn_join(qdf, bdf, dim=64, k=3, m=16, k_codes=1, iters=1).collect()
        assert {r.base_id for r in out} == {100}
        assert len(out) == 6  # every query found the single base row
        # small-ref xcorpus: |ref| < C floor, all 5 ref rows reachable
        ref = spark.createDataFrame(
            [(200 + i, "b", [float((i + j) % 3) for j in range(64)]) for i in range(5)],
            ["vec_id", "label", "embedding"],
        )
        pairs = SIM.adc_shortlist_pairs(
            SIM.normalize_rounded(qdf, out_col="nv"),
            SIM.pq_fit(SIM.normalize_rounded(ref, out_col="nv"), dim=64, m=16,
                       k_codes=2, iters=1, vec_col="nv"),
            SIM.pq_encode(SIM.normalize_rounded(ref, out_col="nv"),
                          SIM.pq_fit(SIM.normalize_rounded(ref, out_col="nv"),
                                     dim=64, m=16, k_codes=2, iters=1, vec_col="nv"),
                          dim=64, m=16, vec_col="nv"),
            shortlist=32, dim=64, m=16, vec_col="nv", index_df=ref,
        ).collect()
        per = {}
        for r in pairs:
            per[r["probe_id"]] = per.get(r["probe_id"], 0) + 1
        assert set(per.values()) == {5}  # ALL ref rows, not |ref|-1

    def test_pq_index_save_load_roundtrip(self, spark, tmp_path):
        """The persisted-index lifecycle: save the base's codebook+codes,
        load them back, and the join through the LOADED assets must be
        row-identical to the in-memory one — the ref_codebook/base_codes
        params' production contract made literal."""
        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            normalize_rounded,
            pq_encode,
            pq_fit,
            pq_index_load,
            pq_index_save,
            pq_knn_join,
        )
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_DIR)
        queries = emb.filter(F.col("vec_id") % 97 == 0)
        base = emb.filter(F.col("vec_id") % 97 != 0)
        base_norm = normalize_rounded(base, out_col="__nv").localCheckpoint()
        book = pq_fit(base_norm, dim=64, m=16, k_codes=16, iters=1, vec_col="__nv")
        codes = pq_encode(base_norm, book, dim=64, m=16, vec_col="__nv")
        path = pq_index_save(book, codes, str(tmp_path / "pqidx"))
        book2, codes2 = pq_index_load(spark, path)

        def run(b, c):
            return sorted(
                (r.query_id, r.base_id, r.cosine_sim)
                for r in pq_knn_join(
                    queries, base, dim=64, k=3, m=16, k_codes=16, iters=1,
                    base_codebook=b, base_codes=c,
                ).collect()
            )

        assert run(book2, codes2) == run(book, codes)


class TestMinhashMd5:
    def test_identical_docs_always_collide(self, spark):
        """Exact duplicates share every signature value → collide in every
        band; an unrelated doc collides in none."""
        rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta eta theta"),
                (3, "totally different words entirely unrelated content here now")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = {(r.doc_a, r.doc_b)
                 for r in D.minhash_lsh_pairs_md5(df, "doc_id").collect()}
        assert pairs == {(1, 2)}

    def test_recall_vs_exact(self, spark):
        """Same recall contract as the xxhash64 variant: most true
        Jaccard>=0.5 pairs collide (8 hashes x 4 bands → p=0.68 at j=0.5,
        0.98 at j=0.8)."""
        docs = load_table(spark, "documents", SF_DIR)
        truth = {
            (r.doc_a, r.doc_b)
            for r in D.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5).collect()
        }
        cand = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_lsh_pairs_md5(docs, "doc_id").collect()
        }
        if truth:
            recall = len(truth & cand) / len(truth)
            assert recall >= 0.5, f"md5-LSH recall {recall} over {len(truth)} pairs"

    def test_bands_must_divide_hashes(self, spark):
        import pytest

        docs = load_table(spark, "documents", SF_DIR).limit(5)
        with pytest.raises(ValueError, match="must divide"):
            D.minhash_lsh_pairs_md5(docs, "doc_id", num_hashes=8, bands=3)

    def test_query_side_broadcasts(self, spark):
        """The candidate join must build on the QUERY side — the base
        corpus never shuffles for candidates (the 100 TB shape)."""
        from dais2021imageprocessingondeltalake_spark.catalog import load_table
        from dais2021imageprocessingondeltalake_spark.operators.similarity import lsh_knn_join
        from pyspark.sql import functions as F

        emb = load_table(spark, "embeddings", SF_DIR)
        out = lsh_knn_join(
            emb.filter(F.col("vec_id") % 97 == 0),
            emb.filter(F.col("vec_id") % 97 != 0),
            dim=64, k=3, n_planes=6,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "BuildLeft" in plan


class TestWinnowingMd5:
    def test_shared_run_guarantees_common_fingerprint(self, spark):
        """Winnowing guarantee: any shared run of window+k-1 = 7 tokens
        must contribute at least one common fingerprint; disjoint docs
        share none."""
        from dais2021imageprocessingondeltalake_spark.operators.text import (
            winnowing_fingerprints_md5,
        )

        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
        docs = spark.createDataFrame(
            [
                (1, f"intro words here {shared} trailing content one"),
                (2, f"{shared} totally different ending tokens now"),
                (3, "unrelated corpus document with its own vocabulary entirely"),
            ],
            ["doc_id", "text"],
        )
        fps = winnowing_fingerprints_md5(docs, "doc_id", k=4, window=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[1] & by_doc[2], "shared 7-token run must share a fingerprint"
        assert not (by_doc[1] & by_doc[3])
        assert not (by_doc[2] & by_doc[3])

    def test_short_docs(self, spark):
        """Docs under k tokens yield no fingerprints; docs with fewer
        k-grams than the window yield exactly one (the clipped window)."""
        from dais2021imageprocessingondeltalake_spark.operators.text import (
            winnowing_fingerprints_md5,
        )

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c d e")],  # 0 k-grams; 2 k-grams < window
            ["doc_id", "text"],
        )
        fps = winnowing_fingerprints_md5(docs, "doc_id", k=4, window=4).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert 1 not in by_doc
        assert len(by_doc[2]) == 1


class TestSimhashMd5:
    def test_identical_equal_near_docs_close(self, spark):
        """Identical docs get identical signatures; a one-token edit moves
        few bit votes (small Hamming distance); unrelated docs differ."""
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
                (4, "entirely different vocabulary with no shared words anywhere else"),
            ],
            ["doc_id", "text"],
        )
        sig = {r.doc_id: r.simhash for r in D.simhash_md5(docs, "doc_id").collect()}
        ham = lambda a, b: bin(a ^ b).count("1")
        assert sig[1] == sig[2]
        assert ham(sig[1], sig[3]) <= 6  # one-token edit, 16-bit signature
        assert ham(sig[1], sig[4]) > ham(sig[1], sig[3])


def test_leakage_split_md5_family_invariants(spark):
    """The md5 hash family honors the same contract as xxhash64: no
    near-dup pair straddles the split, and an unknown family raises."""
    import pytest

    from dais2021imageprocessingondeltalake_spark import queries_all as q

    side = {
        r.doc_id: r.split
        for r in q.REGISTRY["q_leakage_split_md5"].fn(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR)
    pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
    for p in pairs.collect():
        assert side[p.doc_a] == side[p.doc_b]
    with pytest.raises(ValueError, match="hash_family"):
        D.leakage_safe_split(docs, "doc_id", pairs, hash_family="sha9")


def test_dedup_cap_keeps_at_most_two_per_cluster(spark):
    """Frequency capping keeps <= 2 members per near-dup cluster,
    deterministically, and passes singletons through."""
    from dais2021imageprocessingondeltalake_spark import queries_all as q

    out = q.REGISTRY["q_dedup_cap"].fn(spark, SF_DIR)
    per_cluster = out.groupBy("cluster_root").count().collect()
    assert all(r["count"] <= 2 for r in per_cluster)
    docs = load_table(spark, "documents", SF_DIR)
    # every kept doc exists; reruns identical
    kept1 = {r.doc_id for r in out.collect()}
    kept2 = {r.doc_id for r in q.REGISTRY["q_dedup_cap"].fn(spark, SF_DIR).collect()}
    assert kept1 == kept2
    assert kept1 <= {r.doc_id for r in docs.select("doc_id").collect()}
    # the capped corpus keeps MORE than keep-one dedup (soft policy)
    keep_one = q.REGISTRY["q_dedup_end2end"].fn(spark, SF_DIR).count()
    assert len(kept1) >= keep_one


class TestContainment:
    def test_planted_subset_dup_found_where_jaccard_misses(self, spark):
        """A 5-token doc quoted verbatim inside a 40-token doc: containment
        of the small doc is 1.0 but jaccard is ~0.1 — the pair must appear
        in containment pairs and must NOT pass a 0.5 jaccard filter."""
        quote = "the quick brown fox jumps"
        filler = " ".join(f"tok{i}" for i in range(35))
        df = spark.createDataFrame(
            [(1, quote), (2, filler + " " + quote), (3, "unrelated words only here")],
            ["doc_id", "text"],
        )
        cont = D.ngram_containment_pairs(df, "doc_id", n=3, threshold=0.9).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in cont] == [(1, 2)]
        assert cont[0]["cont_a_in_b"] == 1.0
        jac = D.ngram_jaccard_pairs(df, "doc_id", n=3, threshold=0.5).collect()
        assert jac == []

    def test_superset_of_jaccard_at_same_threshold(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        jac = {
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5).collect()
        }
        cont = {
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_containment_pairs(docs, "doc_id", n=3, threshold=0.5).collect()
        }
        assert jac <= cont

    def test_max_doc_freq_only_drops_pairs(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        full = {
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_containment_pairs(docs, "doc_id", threshold=0.5).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_containment_pairs(
                docs, "doc_id", threshold=0.5, max_doc_freq=3
            ).collect()
        }
        assert capped <= full


class TestPiiRedact:
    def test_planted_pii_replaced_with_typed_placeholders(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.text import redact_pii

        df = spark.createDataFrame(
            [(1, "mail me at jo.doe+x@site.org or call 555-0199, ssn 123-45-6789")],
            ["doc_id", "text"],
        )
        out = redact_pii(df).collect()[0]["text"]
        assert out == "mail me at [EMAIL] or call [PHONE], ssn [SSN]"

    def test_ssn_redacted_before_phone_pattern_can_split_it(self, spark):
        """ddd-dd-dddd contains a ddd-dddd substring; ordering must yield
        one [SSN], never a mangled partial [PHONE]."""
        from dais2021imageprocessingondeltalake_spark.operators.text import redact_pii

        df = spark.createDataFrame([(1, "id 987-65-4321 end")], ["doc_id", "text"])
        out = redact_pii(df).collect()[0]["text"]
        assert out == "id [SSN] end"
        assert "[PHONE]" not in out

    def test_clean_text_passthrough(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.text import redact_pii

        df = spark.createDataFrame([(1, "no sensitive content here")], ["doc_id", "text"])
        assert redact_pii(df).collect()[0]["text"] == "no sensitive content here"


class TestBigramPmi:
    def test_hand_computed_pmi(self, spark):
        """Corpus of 'a b' x6: bigrams {('a','b'): 6}, unigrams a=6, b=6,
        nb=6, nu=12 -> pmi = ln(6*12*12/(6*6*6)) = ln(4)."""
        import math

        from dais2021imageprocessingondeltalake_spark.operators.text import bigram_pmi

        df = spark.createDataFrame([(i, "a b") for i in range(6)], ["doc_id", "text"])
        rows = bigram_pmi(df, min_count=5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["w1"], r["w2"], r["n_pair"]) == ("a", "b", 6)
        assert r["pmi"] == round(math.log(4.0), 6)

    def test_collocation_outranks_glue(self, spark):
        """A bigram that ALWAYS co-occurs ('new york') gets higher PMI
        than one whose parts also appear apart."""
        from dais2021imageprocessingondeltalake_spark.operators.text import bigram_pmi

        rows = [(i, "new york is big and big is far") for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pmi = {
            (r["w1"], r["w2"]): r["pmi"] for r in bigram_pmi(df, min_count=5).collect()
        }
        assert pmi[("new", "york")] > pmi[("is", "big")]

    def test_min_count_filters_noise(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.text import bigram_pmi

        df = spark.createDataFrame([(1, "x y"), (2, "x y"), (3, "p q")], ["doc_id", "text"])
        pairs = {(r["w1"], r["w2"]) for r in bigram_pmi(df, min_count=2).collect()}
        assert pairs == {("x", "y")}


class TestRandomProjection:
    def test_rp_ann_recall_vs_bruteforce(self, spark):
        """The registered knobs (16 dims, shortlist 100) must hold solid
        recall; widening the shortlist must not hurt it (monotone knob)."""
        emb = load_table(spark, "embeddings", SF_DIR)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        exact = [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10, round_dp=6).collect()]
        approx = [
            r["vec_id"]
            for r in SIM.rp_ann_topk(emb, qv, k=10, shortlist=100, out_dim=16).collect()
        ]
        assert approx[0] == 0  # query is its own nearest neighbor
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.6, f"RP ANN recall@10 = {recall}"
        narrow = [
            r["vec_id"]
            for r in SIM.rp_ann_topk(emb, qv, k=10, shortlist=50, out_dim=16).collect()
        ]
        assert len(set(exact) & set(approx)) >= len(set(exact) & set(narrow))

    def test_projection_shape_and_determinism(self, spark):
        emb = load_table(spark, "embeddings", SF_DIR)
        rp = SIM.random_projection(emb, out_dim=8)
        row = rp.filter(F.col("vec_id") == 0).first()
        assert len(row["rp"]) == 8
        again = SIM.random_projection(emb.repartition(7), out_dim=8)
        assert again.filter(F.col("vec_id") == 0).first()["rp"] == row["rp"]

    def test_projection_preserves_self_similarity(self, spark):
        """cosine(rp(v), rp(v)) == 1: the coarse stage ranks the query's
        own vector first, so stage-1 can never evict the true top hit."""
        emb = load_table(spark, "embeddings", SF_DIR)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        shortlisted = SIM.rp_ann_topk(emb, qv, k=1, shortlist=1).collect()
        assert shortlisted[0]["vec_id"] == 0


class TestMinhashOph:
    def test_planted_exact_duplicates_always_collide(self, spark):
        """Identical texts have identical shingle sets, hence identical
        OPH signatures — every band collides."""
        docs = load_table(spark, "documents", SF_DIR).limit(30)
        clone = docs.filter(F.col("doc_id") == docs.first()["doc_id"]).withColumn(
            "doc_id", F.lit(99999).cast("bigint")
        )
        pairs = D.minhash_lsh_pairs_oph(docs.unionByName(clone), "doc_id").collect()
        assert any(r["doc_b"] == 99999 for r in pairs)

    def test_densification_fills_every_bin(self, spark):
        """A short doc (1 shingle -> 1 non-empty bin) must still emit a
        complete 16-slot signature, every slot equal to that one value."""
        df = spark.createDataFrame([(1, "only three tokens")], ["doc_id", "text"])
        row = D.minhash_oph_signature_cols(df, "doc_id").collect()[0]
        vals = {row[f"sig_{j}"] for j in range(16)}
        assert len(vals) == 1 and None not in vals

    def test_recall_vs_exact_jaccard(self, spark):
        """OPH banding must recover a solid fraction of high-Jaccard
        pairs (noisier per-bin minima than independent hashes, so the
        bound is looser than the classic family's)."""
        docs = load_table(spark, "documents", SF_DIR)
        truth = {
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.7).collect()
        }
        if not truth:
            import pytest

            pytest.skip("no 0.7-Jaccard pairs at this scale")
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in D.minhash_lsh_pairs_oph(docs, "doc_id").collect()
        }
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.5, f"OPH recall {recall} over {len(truth)} true pairs"

    def test_one_hash_per_shingle(self, spark):
        """The plan must contain exactly ONE md5 call (the OPH point:
        hashing work is 1/num_hashes of the classic family)."""
        docs = load_table(spark, "documents", SF_DIR).limit(5)
        plan = D.minhash_oph_signature_cols(docs, "doc_id")._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("md5") == 1, plan


class TestCorpusDiagnostics:
    def test_zipf_slope_near_minus_one_on_zipfian_corpus(self, spark):
        """A synthetic corpus with freq(rank) ~ 1/rank must fit a slope
        close to -1; a uniform-frequency corpus fits ~0."""
        import math

        from dais2021imageprocessingondeltalake_spark.queries_llm import q_zipf_slope

        # build zipfian text: term_r repeated ceil(200/r) times
        words = []
        for r in range(1, 51):
            words += [f"t{r:03d}"] * math.ceil(200 / r)
        df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
        df.createOrReplaceTempView("__zipf_tmp")
        from dais2021imageprocessingondeltalake_spark.operators import text as TXx
        tf = (
            df.select(F.explode(TXx.tokens(F.col("text"))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
        )
        from pyspark.sql import Window
        ranked = (
            tf.orderBy(F.col("freq").desc(), F.col("term")).limit(1000)
            .withColumn("rnk", F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("term"))))
        )
        pts = ranked.select(
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
        slope = pts.agg(
            (F.covar_pop("y", "x") / F.var_pop("x")).alias("s")
        ).collect()[0]["s"]
        assert -1.2 < slope < -0.8, slope

    def test_lang_confusion_counts_partition_langs(self, spark):
        """Planted corpus where marker words determine the language: the
        matrix diagonal holds exactly the planted counts."""
        from dais2021imageprocessingondeltalake_spark.queries_llm import q_lang_confusion
        from dais2021imageprocessingondeltalake_spark.operators.text import language_id

        rows = [
            (1, "en", "the cat and the hat"),
            (2, "en", "a dog of note"),
            (3, "de", "der hund und die katze"),
            (4, "fr", "le chat et les chiens"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        m = {
            (r["lang"], r["lang_pred"]): r["n"]
            for r in language_id(df)
            .groupBy("lang", "lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert m == {("en", "en"): 2, ("de", "de"): 1, ("fr", "fr"): 1}


def test_dedup_quality_beats_banding_theory(spark):
    """The certified report's recall must beat the theoretical j=0.5
    collision lower bound (0.68) and precision must be meaningful."""
    from dais2021imageprocessingondeltalake_spark.queries_llm import q_dedup_quality

    row = q_dedup_quality(spark, SF_DIR).collect()[0]
    assert row["n_truth"] > 0
    assert row["recall"] >= 0.68
    assert 0 < row["precision"] <= 1.0


def test_ann_quality_row_sane(spark):
    from dais2021imageprocessingondeltalake_spark.queries_llm import q_ann_quality

    row = q_ann_quality(spark, SF_DIR).collect()[0]
    for k in ("recall_lsh", "recall_q8", "recall_rp"):
        assert 0.0 <= row[k] <= 1.0
    assert row["recall_q8"] >= 0.8  # 50-of-500 shortlist: near-exact


class TestFuzzyJoin:
    def test_planted_typo_found(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.text import (
            edit_distance_join_1,
        )

        df = spark.createDataFrame(
            [(1, "acme corp"), (2, "acme corq"), (3, "zzzz zzzz"), (4, "acme co..")],
            ["id", "name"],
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_join_1(df, "id", "name").collect()
        }
        assert pairs == {(1, 2): 1}  # 4 is two edits away from 1; 3 unrelated

    def test_blocking_equals_naive(self, spark):
        """Pigeonhole candidates + verify must equal the naive quadratic
        levenshtein filter on equal-length strings."""
        from dais2021imageprocessingondeltalake_spark.operators.text import (
            edit_distance_join_1,
        )

        c = load_table(spark, "customer", SF_DIR).select("c_custkey", "c_name")
        fast = {
            (r["id_a"], r["id_b"])
            for r in edit_distance_join_1(c, "c_custkey", "c_name").collect()
        }
        a, b = c.alias("a"), c.alias("b")
        naive = {
            (r["id_a"], r["id_b"])
            for r in a.join(
                b,
                (F.col("a.c_custkey") < F.col("b.c_custkey"))
                & (F.length("a.c_name") == F.length("b.c_name"))
                & (F.levenshtein("a.c_name", "b.c_name") <= 1),
            )
            .select(
                F.col("a.c_custkey").alias("id_a"), F.col("b.c_custkey").alias("id_b")
            )
            .collect()
        }
        assert fast == naive and naive


class TestKfoldSplit:
    def test_no_cluster_straddles_folds(self, spark):
        """Every near-dup pair's two members must share a fold — the
        leakage guarantee, per CV round."""
        docs = load_table(spark, "documents", SF_DIR)
        pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
        folds = D.kfold_leakage_safe(docs, "doc_id", pairs, k=5).select(
            "doc_id", "fold"
        )
        a = folds.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("fold", "fa")
        b = folds.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("fold", "fb")
        straddle = pairs.join(a, "doc_a").join(b, "doc_b").filter("fa <> fb")
        assert straddle.count() == 0

    def test_folds_cover_range_and_roughly_uniform(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
        sizes = {
            r["fold"]: r["n"]
            for r in D.kfold_leakage_safe(docs, "doc_id", pairs, k=5)
            .groupBy("fold")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(sizes) == {0, 1, 2, 3, 4}
        n = sum(sizes.values())
        for f, c in sizes.items():
            assert abs(c / n - 0.2) < 0.1, sizes

    def test_k_validated(self, spark):
        import pytest

        docs = load_table(spark, "documents", SF_DIR)
        pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
        with pytest.raises(ValueError):
            D.kfold_leakage_safe(docs, "doc_id", pairs, k=1)


def test_margin_mine_lsh_recall_floor_sized_config(spark):
    """THE REGISTERED CONFIG's recall floor (VERDICT r5 item 3): the
    data-sized L-table OR-construction (p = size_n_planes, L =
    size_n_tables(p) — exactly what q_margin_mine_lsh runs) must
    recover >= 0.90 of the brute-force high-margin (probe, best) pairs
    at the driver's gate scale. 0.90 is measured-minus-slack: measured
    0.964 at sf0.01 (p=4, L=5) and 0.983 at sf0.1 (p=6, L=11) against
    the 0.95 design target — the floor catches a sizing-rule or probe
    regression without flaking on corpus noise. Where both paths pick
    the same best neighbor, sims must agree exactly (identical
    6dp-rounded cosine on identical inputs — the Arrow matmul's
    reassociation ulps are absorbed by the rounding)."""
    from .conftest import SF_DIR_MID

    emb = load_table(spark, "embeddings", SF_DIR_MID)
    n = emb.count()
    p = SIM.size_n_planes(n, target_bucket=32, min_planes=4, max_planes=8)
    exact = {
        r["probe_id"]: (r["best_id"], r["sim1"])
        for r in SIM.margin_mine(emb, min_margin_x10k=11000).collect()
    }
    approx = {
        r["probe_id"]: (r["best_id"], r["sim1"])
        for r in SIM.margin_mine_lsh(
            emb,
            dim=64,
            n_planes=p,
            n_tables=SIM.size_n_tables(p),
            min_margin_x10k=11000,
        ).collect()
    }
    assert exact, "brute-force oracle found no pairs — test corpus degenerate"
    hit = sum(
        1 for pr, (b, _) in exact.items() if pr in approx and approx[pr][0] == b
    )
    recall = hit / len(exact)
    assert recall >= 0.90, f"sized margin-LSH best-pair recall = {recall:.2f}"
    # where both paths picked the same best neighbor, sims are identical
    for pr, (b, s1) in exact.items():
        if pr in approx and approx[pr][0] == b:
            assert approx[pr][1] == s1, (pr, b, s1, approx[pr][1])


@pytest.mark.slow
def test_margin_lsh_recall_report_floor_both_scales(spark):
    """The certified recall REPORT must clear its own emitted floor at
    BOTH driver scales (VERDICT r5 item 3's done-criterion): one row,
    recall_x10k >= floor_x10k = 8500, meets_floor true — at sf0.01
    (p=4, L=5) AND sf0.1 (p=6, L=11), i.e. across a plane-count step,
    which is exactly where the retired frozen-radius design decayed."""
    from dais2021imageprocessingondeltalake_spark.queries_llm import q_margin_lsh_recall
    from .conftest import SF_DIR_MID

    for sf in (SF_DIR_MID, "/root/testdata/sf0.1"):
        row = q_margin_lsh_recall(spark, sf).collect()[0]
        assert row["floor_x10k"] == 8500
        assert row["meets_floor"] is True, (sf, row)
        assert row["recall_x10k"] >= 8500, (sf, row)


def test_margin_mine_lsh_legacy_single_table_mode(spark):
    """The legacy single-table, Hamming-1 multiprobe mode pinned by this
    test (n_planes=4, n_tables=1 — NOT the registered sized config,
    which uses the L-table OR-construction) still produces a subset-
    consistent result: modest recall, exact sim agreement on shared
    best pairs."""
    from .conftest import SF_DIR_MID

    emb = load_table(spark, "embeddings", SF_DIR_MID)
    exact = {
        r["probe_id"]: (r["best_id"], r["sim1"])
        for r in SIM.margin_mine(emb, min_margin_x10k=11000).collect()
    }
    approx = {
        r["probe_id"]: (r["best_id"], r["sim1"])
        for r in SIM.margin_mine_lsh(
            emb, dim=64, n_planes=4, min_margin_x10k=11000
        ).collect()
    }
    assert exact, "brute-force oracle found no pairs — test corpus degenerate"
    hit = sum(
        1 for pr, (b, _) in exact.items() if pr in approx and approx[pr][0] == b
    )
    assert hit / len(exact) >= 0.5, "legacy multiprobe recall regressed"
    for pr, (b, s1) in exact.items():
        if pr in approx and approx[pr][0] == b:
            assert approx[pr][1] == s1, (pr, b, s1, approx[pr][1])


class TestMarginMinePQ:
    """The ADC-shortlisted miner (VERDICT r6 item 2's closed duality):
    recall >= 0.85 held at a C·N full-vector budget."""

    def test_size_adc_shortlist_rule(self):
        assert SIM.size_adc_shortlist(0) == 32
        assert SIM.size_adc_shortlist(100) == 32  # 2*10 < min 32
        assert SIM.size_adc_shortlist(500) == 46  # 2*ceil(sqrt(500))=2*23
        assert SIM.size_adc_shortlist(2000) == 90  # 2*45
        assert SIM.size_adc_shortlist(30000) == 348  # 2*174
        # exact square boundary: ceil(sqrt(2025)) = 45
        assert SIM.size_adc_shortlist(2025) == 90

    def test_size_nprobe_reads_curve(self):
        curve = [(1, 2000), (2, 3500), (4, 5500), (8, 7900), (16, 9600)]
        assert SIM.size_nprobe(curve, 8500) == 16
        assert SIM.size_nprobe(curve, 7900) == 8
        assert SIM.size_nprobe(curve, 9700) is None  # honest: unreachable
        # dict rows (the Row-access path — Row subclasses tuple, so the
        # field path must win over positional)
        rows = [{"nprobe": 2, "recall_x10k": 9000, "n_cand": 99999}]
        assert SIM.size_nprobe(rows, 8500) == 2

    def test_size_nprobe_rejects_ambiguous_rows(self):
        """ADVICE r7: no positional rescue for structured rows — a Row
        or dict missing the named fields must raise, not silently size
        from whatever its first two fields happen to be; and a plain
        tuple wider than (nprobe, recall_x10k) is ambiguous too."""
        from pyspark.sql import Row

        with pytest.raises(KeyError):
            SIM.size_nprobe([{"recall_x10k": 9000, "np": 2}], 8500)
        # reordered-field Row: named access reads the RIGHT columns
        r = Row(recall_x10k=9000, nprobe=2)
        assert SIM.size_nprobe([r], 8500) == 2
        with pytest.raises(ValueError, match="positional rows"):
            SIM.size_nprobe([(2, 123456, 9000)], 8500)

    def test_normalize_rounded_drops_zero_norm(self, spark):
        """ADVICE r7: an all-zero embedding has no direction — it is
        dropped by an explicit sum-of-squares predicate, not as silent
        NaN fallout downstream."""
        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0, 3.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        )
        out = SIM.normalize_rounded(df).collect()
        assert [r["vec_id"] for r in out] == [1]
        assert out[0]["nv"] == [0.0, 0.0, 0.0, 1.0]

    def test_stale_persisted_index_raises(self, spark):
        """ADVICE r7: a persisted code set that does not exactly cover
        the live index rows (new unencoded rows, or deleted ids still
        in the codes) must raise, not silently scan the intersection."""
        emb = load_table(spark, "embeddings", SF_DIR).limit(40).localCheckpoint()
        norm = SIM.normalize_rounded(emb, out_col="nv").localCheckpoint()
        book = SIM.pq_fit(norm, dim=64, m=16, k_codes=8, iters=1, vec_col="nv")
        codes = SIM.pq_encode(norm, book, dim=64, m=16, vec_col="nv")
        stale_codes = codes.filter(F.col("vec_id") % 5 != 0)  # missing rows
        with pytest.raises(ValueError, match="stale PQ index"):
            SIM.adc_shortlist_pairs(
                norm, book, stale_codes, shortlist=4, dim=64, m=16,
                vec_col="nv", validate_coverage=True,
            ).collect()
        # exact cover passes, and the guarded scan equals the unguarded one
        guarded = SIM.adc_shortlist_pairs(
            norm, book, codes, shortlist=4, dim=64, m=16,
            vec_col="nv", validate_coverage=True,
        )
        plain = SIM.adc_shortlist_pairs(
            norm, book, codes, shortlist=4, dim=64, m=16, vec_col="nv",
        )
        assert {tuple(r) for r in guarded.collect()} == {
            tuple(r) for r in plain.collect()
        }

    def test_validation_and_residency_guard(self, spark):
        emb = load_table(spark, "embeddings", SF_DIR)
        norm = SIM.normalize_rounded(emb)
        book = SIM.pq_fit(emb, dim=64, m=16, k_codes=16, iters=1, vec_col="embedding")
        codes = SIM.pq_encode(emb, book, dim=64, m=16)
        with pytest.raises(ValueError):
            SIM.adc_shortlist_pairs(norm, book, codes, shortlist=0, dim=64, m=16)
        with pytest.raises(ValueError):
            SIM.adc_shortlist_pairs(norm, book, codes, shortlist=8, dim=64, m=7)
        with pytest.raises(ValueError, match="residency budget"):
            SIM.adc_shortlist_pairs(
                norm, book, codes, shortlist=8, dim=64, m=16, max_index_bytes=64
            )

    def test_chunked_scan_is_chunk_invariant(self, spark):
        """The neighbor axis scans in chunks with a running top-C merge;
        the ranking is a total order (adc desc, nbr_id asc) so the pair
        set must be identical at any chunk size — including chunks
        smaller than C, the degenerate worst case."""
        emb = load_table(spark, "embeddings", SF_DIR)
        norm = SIM.normalize_rounded(emb, out_col="nv").localCheckpoint()
        book = SIM.pq_fit(norm, dim=64, m=16, k_codes=16, iters=1, vec_col="nv")
        codes = SIM.pq_encode(norm, book, dim=64, m=16, vec_col="nv")
        def pairs(chunk):
            return {
                (r["probe_id"], r["nbr_id"])
                for r in SIM.adc_shortlist_pairs(
                    norm, book, codes, shortlist=12, dim=64, m=16,
                    vec_col="nv", nbr_chunk=chunk,
                ).collect()
            }
        big = pairs(1 << 18)
        assert pairs(7) == big and big
        # exactly min(C, matching-base) rows per probe
        per = {}
        for p, _ in big:
            per[p] = per.get(p, 0) + 1
        assert set(per.values()) == {12}

    def test_sharded_scan_equals_unsharded(self, spark):
        """The beyond-residency path: n hash shards of the codes, each
        scanned against its own in-RAM index, re-selected to the global
        top-C by the same total order — the PAIR SET must be identical
        to the one-shot scan (this is what lets q_margin_pq_sharded
        reuse q_margin_mine_pq's oracle verbatim)."""
        emb = load_table(spark, "embeddings", SF_DIR)
        norm = SIM.normalize_rounded(emb, out_col="nv").localCheckpoint()
        book = SIM.pq_fit(norm, dim=64, m=16, k_codes=16, iters=1, vec_col="nv")
        codes = SIM.pq_encode(norm, book, dim=64, m=16, vec_col="nv")

        def pairs(**kw):
            return {
                (r["probe_id"], r["nbr_id"])
                for r in SIM.adc_shortlist_pairs(
                    norm, book, codes, shortlist=12, dim=64, m=16,
                    vec_col="nv", **kw,
                ).collect()
            }

        one = pairs()
        assert pairs(n_shards=3) == one and one
        # sharding is ALSO what satisfies the residency guard: a budget
        # that one shard of the index fits but the whole index does not
        n = norm.count()
        whole_bytes = n * (16 + 16)
        budget = whole_bytes // 2  # fails unsharded, passes at 4 shards
        with pytest.raises(ValueError, match="residency budget"):
            pairs(max_index_bytes=budget)
        assert pairs(n_shards=4, max_index_bytes=budget) == one

    def test_xcorpus_sides_and_persisted_asset_path(self, spark):
        """The incremental-ingest miner: probes only from the NEW batch,
        neighbors only from the REFERENCE; and the production path that
        reuses a persisted codebook+codes index must be row-identical to
        the self-computing path (the cross_corpus_near_dup_flags
        convention)."""
        emb = load_table(spark, "embeddings", SF_DIR)
        new = emb.filter(F.col("vec_id") % 3 == 0)
        ref = emb.filter(F.col("vec_id") % 3 != 0)
        mined = SIM.margin_mine_pq_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1, min_margin_x10k=10200
        ).collect()
        assert mined
        new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
        ref_ids = {r["vec_id"] for r in ref.select("vec_id").collect()}
        assert {r["probe_id"] for r in mined} <= new_ids
        assert {r["best_id"] for r in mined} <= ref_ids
        # persisted-asset path: precompute the ref index, pass it in
        ref_norm = SIM.normalize_rounded(ref, out_col="__nv").localCheckpoint()
        book = SIM.pq_fit(ref_norm, dim=64, m=16, k_codes=16, iters=1, vec_col="__nv")
        codes = SIM.pq_encode(ref_norm, book, dim=64, m=16, vec_col="__nv")
        reused = SIM.margin_mine_pq_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1, min_margin_x10k=10200,
            ref_codebook=book, ref_codes=codes,
        ).collect()
        key = lambda r: (r["probe_id"], r["best_id"], r["sim1"], r["sim2"])
        assert sorted(map(key, reused)) == sorted(map(key, mined))

    @pytest.mark.slow
    def test_recall_floor_and_exact_sims_both_scales(self, spark):
        """The closed-duality contract at BOTH driver scales: pair
        recall >= 0.90 (measured 0.9689 / 0.9628 — floor is
        measured-minus-slack, certified at 0.85 in q_margin_pq_recall)
        with a C·N budget, and wherever the miner picks the brute best
        neighbor the emitted sims are IDENTICAL (exact re-rank)."""
        from .conftest import SF_DIR_MID

        for sf in (SF_DIR_MID, "/root/testdata/sf0.1"):
            emb = load_table(spark, "embeddings", sf)
            exact = {
                r["probe_id"]: (r["best_id"], r["sim1"])
                for r in SIM.margin_mine(emb, min_margin_x10k=11000).collect()
            }
            approx = {
                r["probe_id"]: (r["best_id"], r["sim1"])
                for r in SIM.margin_mine_pq(
                    emb, dim=64, m=16, k_codes=16, iters=1,
                    min_margin_x10k=11000,
                ).collect()
            }
            assert exact, "brute oracle found no pairs — corpus degenerate"
            hit = sum(
                1 for pr, (b, _) in exact.items()
                if pr in approx and approx[pr][0] == b
            )
            recall = hit / len(exact)
            assert recall >= 0.90, f"PQ-margin recall {recall:.3f} at {sf}"
            for pr, (b, s1) in exact.items():
                if pr in approx and approx[pr][0] == b:
                    assert approx[pr][1] == s1, (pr, b, s1, approx[pr][1])


class TestIvfadc:
    """IVFADC (r8): coarse-cell pruning composed in front of the ADC
    scan — the FAISS production composition (Jégou-Douze-Schmid TPAMI
    2011 §V), making the mining SCAN sub-quadratic, not just its
    shortlist."""

    def test_full_probe_equals_flat_scan(self, spark):
        """nprobe = k (every cell probed) must reproduce the flat PQ
        miner EXACTLY — the property that makes the sizing ladder's top
        rung a guaranteed-reachable operating point and lets one recall
        framework certify both scans."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        key = lambda r: tuple(r)
        flat = sorted(
            map(key, SIM.margin_mine_pq(
                emb, dim=64, m=16, k_codes=16, iters=1, min_margin_x10k=11000
            ).collect())
        )
        full = sorted(
            map(key, SIM.margin_mine_ivfadc(
                emb, dim=64, nprobe=k, k_cells=k, m=16, k_codes=16,
                iters=1, min_margin_x10k=11000,
            ).collect())
        )
        assert flat == full and flat

    def test_assign_cells_ranked_matches_topn(self, spark):
        """The array-form assignment must agree rank-for-rank with the
        exploded assign_topn_centroids (same certified E-step
        machinery, no explode+regroup round trip)."""
        emb = load_table(spark, "embeddings", SF_DIR).limit(60).localCheckpoint()
        _, cents = SIM.kmeans_fit_distributed(emb, k=7, iters=1, round_dp=6)
        arr = {
            r["vec_id"]: list(r["cells"])
            for r in SIM.assign_cells_ranked(emb, cents, n=4).collect()
        }
        exploded = {}
        for r in SIM.assign_topn_centroids(emb, cents, n=4).collect():
            exploded.setdefault(r["vec_id"], {})[r["rank"]] = r["assigned_label"]
        assert arr and set(arr) == set(exploded)
        for vid, cells in arr.items():
            assert cells == [exploded[vid][rk] for rk in range(1, len(cells) + 1)]
        with pytest.raises(ValueError, match="n >= 1"):
            SIM.assign_cells_ranked(emb, cents, n=0)

    @pytest.mark.slow
    def test_curve_monotone_and_sized_consistent(self, spark):
        """The measured ladder over the r9 MIXED rung family: every
        family rung is present, realized nprobe matches
        ivfadc_rung_nprobe, duplicate-nprobe rungs (abs/frac collisions
        at small k) report IDENTICAL stats, scanned-code budget grows
        strictly with distinct nprobe, recall is non-decreasing (more
        cells probed can only add candidates under a total-order
        top-C... up to shortlist displacement — asserted non-decreasing
        on this corpus), the top rung scans ALL N² codes, and the sized
        decision row equals the minimum-nprobe rung clearing the
        floor (SIM.size_ivfadc_rung's deterministic order)."""
        import math

        from dais2021imageprocessingondeltalake_spark import queries_all as q

        curve = q.REGISTRY["q_margin_ivfadc_curve"].fn(spark, SF_DIR).collect()
        assert sorted((r["kind"], r["rung"]) for r in curve) == sorted(
            (k, s) for k, s in SIM.IVFADC_RUNGS
        )
        n = load_table(spark, "embeddings", SF_DIR).count()
        kc = math.isqrt(n - 1) + 1
        for r in curve:
            assert r["nprobe"] == SIM.ivfadc_rung_nprobe(r["kind"], r["rung"], kc)
        by_np = {}
        for r in curve:
            stats = (r["n_scanned"], r["n_mined"], r["n_hit"], r["recall_x10k"])
            assert by_np.setdefault(r["nprobe"], stats) == stats
        distinct = [by_np[np_] for np_ in sorted(by_np)]
        assert distinct[-1][0] == n * n
        for a, b in zip(distinct, distinct[1:]):
            assert a[0] < b[0]
            assert a[3] <= b[3]
        sized = q.REGISTRY["q_margin_ivfadc_sized"].fn(spark, SF_DIR).collect()[0]
        assert sized["reached"]
        kind, rung, np_ = SIM.size_ivfadc_rung(
            [(r["kind"], r["rung"], r["nprobe"], r["recall_x10k"]) for r in curve]
        )
        assert (sized["sized_kind"], sized["sized_rung"]) == (kind, rung)
        assert sized["sized_nprobe"] == np_
        assert sized["scan_frac_x10k"] == (10000 * by_np[np_][0]) // (n * n)
        # the whole point: the sized rung scans a proper fraction
        assert sized["scan_frac_x10k"] < 10000
        # and the abs rungs exist below the old s=3 floor: the cheapest
        # family rung probes fewer cells than ceil(k/4) once k > 16
        assert min(by_np) <= max(4, (kc * 3 + 11) // 12)

    def test_saturated_ladder_refusal_row_and_miner_raise(self, spark):
        """VERDICT r9 item 5: a SATURATED ladder (no rung clears the
        floor — measured for flat m=16 at the 200× probe, recall
        plateauing ~0.83 at ANY scanned fraction) must surface a
        certified REFUSAL, not a silently floored rung: the sized
        decision emits reached=false + NULL operating point + a `route`
        naming the certified escapes, matching a DuckDB replay of the
        same decision SQL over the same ladder rows; and the sized
        MINER raises LadderSaturatedError carrying the same routing."""
        import duckdb

        from dais2021imageprocessingondeltalake_spark import queries_llm as QL

        # a plausible deep-corpus ladder: recall plateaus below 0.85
        sat = [
            ("abs", 4, 4, 10_000, 50, 10, 5200),
            ("abs", 16, 16, 40_000, 180, 40, 7700),
            ("frac", 6, 159, 250_000, 400, 80, 8290),
            ("frac", 12, 317, 1_000_000, 480, 95, 8310),
        ]
        assert SIM.size_ivfadc_rung(sat) is None
        row = QL._ivfadc_sized_result(
            spark, SF_DIR, sat, residual=False
        ).collect()[0]
        assert row["reached"] is False
        assert row["sized_kind"] is None and row["sized_nprobe"] is None
        assert row["scan_frac_x10k"] is None
        assert row["route"] == "residual_ivfadc,m32"
        res_row = QL._ivfadc_sized_result(
            spark, SF_DIR, sat, residual=True
        ).collect()[0]
        assert res_row["reached"] is False and res_row["route"] == "m32"
        # oracle-matching at the decision level: DuckDB replays the
        # sized CTE + refusal projection over the identical ladder rows
        vals = ", ".join(
            f"('{k}', {r}, {np_}, {ns}, {rec})"
            for k, r, np_, ns, _, _, rec in sat
        )
        got = duckdb.sql(
            f"""
            WITH ladder(kind, rung, nprobe, n_scanned, recall_x10k) AS (
              VALUES {vals}
            ), sized AS (
              SELECT * FROM ladder WHERE recall_x10k >= 8500
              ORDER BY nprobe, kind, rung LIMIT 1
            )
            SELECT (SELECT kind FROM sized) AS sized_kind,
                   EXISTS (SELECT 1 FROM sized) AS reached,
                   CASE WHEN EXISTS (SELECT 1 FROM sized) THEN NULL
                        ELSE 'residual_ivfadc,m32' END AS route
            """
        ).fetchone()
        assert got == (None, False, "residual_ivfadc,m32")
        assert (row["sized_kind"], row["reached"], row["route"]) == got
        # the sized MINER refuses loudly, routing to the escapes,
        # BEFORE any mine runs (cache-injected saturating ladder)
        QL._IVFADC_CURVE_CACHE["__sat__"] = sat
        try:
            with pytest.raises(
                SIM.LadderSaturatedError, match="residual_ivfadc,m32"
            ):
                QL._ivfadc_sized_mine(spark, "__sat__", residual=False)
        finally:
            del QL._IVFADC_CURVE_CACHE["__sat__"]

    def test_routed_oracle_composition(self):
        """The r11 res-core split must be lossless and the combined
        routed oracle collision-free: (a) prefix + chain('') reproduces
        the res core byte-for-byte (the flat split's r9 contract);
        (b) every CTE alias in the three-leg routed oracle is unique —
        DuckDB hard-errors on duplicates, so this pins the suffixing."""
        import re

        from dais2021imageprocessingondeltalake_spark import queries_llm as QL

        assert QL._pq_adc_res_core_sql() == (
            QL._pq_adc_prefix_sql() + ", " + QL._pq_adc_res_chain_sql()
        )
        sql = QL._margin_mine_routed_oracle()
        names = re.findall(r"(\w+) AS MATERIALIZED \(", sql)
        assert names and len(names) == len(set(names))

    @pytest.mark.slow
    def test_routed_miner_executes_the_route(self, spark):
        """VERDICT r10 item 2: the routed composite must EXECUTE the
        route the refusal emits, not just print it. Leg certification
        by cache injection: (a) flat ladder saturated → the miner
        follows 'residual_ivfadc' — rows identical to the residual
        sized mine, provenance says so; (b) BOTH ladders saturated →
        the m=32 code-budget escape executes — rows identical to the
        m32 flat-ADC chain; (c) nothing saturated → route='flat', rows
        identical to the flat sized mine (the oracle-matched driver
        shape); (d) a DuckDB replay of the cascade decision over the
        same injected ladders picks the same legs."""
        import duckdb

        from dais2021imageprocessingondeltalake_spark import queries_all as q
        from dais2021imageprocessingondeltalake_spark import queries_llm as QL

        sat = [
            ("abs", 4, 4, 10_000, 50, 10, 5200),
            ("abs", 16, 16, 40_000, 180, 40, 7700),
            ("frac", 6, 159, 250_000, 400, 80, 8290),
            ("frac", 12, 317, 1_000_000, 480, 95, 8310),
        ]
        routed = q.REGISTRY["q_margin_mine_routed"].fn
        key = lambda df: sorted(tuple(r) for r in df.collect())

        # (c) live corpus: flat reaches, provenance 'flat'
        base = routed(spark, SF_DIR)
        flat_rows = key(QL._ivfadc_sized_mine(spark, SF_DIR, residual=False))
        got = key(base)
        assert {r[-1] for r in got} == {"flat"}
        assert [r[:-1] for r in got] == flat_rows

        # (a) flat saturated, residual live → residual leg executes
        old_flat = QL._IVFADC_CURVE_CACHE.get(SF_DIR)
        QL._IVFADC_CURVE_CACHE[SF_DIR] = sat
        try:
            res_rows = key(
                QL._ivfadc_sized_mine(spark, SF_DIR, residual=True)
            )
            got = key(routed(spark, SF_DIR))
            assert {r[-1] for r in got} == {"residual_ivfadc"}
            assert [r[:-1] for r in got] == res_rows

            # (b) both saturated → m32 escape executes
            old_res = QL._IVFADC_RES_CURVE_CACHE.get(SF_DIR)
            QL._IVFADC_RES_CURVE_CACHE[SF_DIR] = sat
            try:
                m32_rows = key(QL._m32_flat_mine(spark, SF_DIR))
                got = key(routed(spark, SF_DIR))
                assert {r[-1] for r in got} == {"m32"}
                assert [r[:-1] for r in got] == m32_rows
                assert m32_rows  # the escape actually mines pairs
            finally:
                if old_res is None:
                    del QL._IVFADC_RES_CURVE_CACHE[SF_DIR]
                else:
                    QL._IVFADC_RES_CURVE_CACHE[SF_DIR] = old_res
        finally:
            if old_flat is None:
                del QL._IVFADC_CURVE_CACHE[SF_DIR]
            else:
                QL._IVFADC_CURVE_CACHE[SF_DIR] = old_flat

        # (d) DuckDB replays the cascade decision over the same
        # injected ladders: flat-saturated/res-live → residual leg;
        # both-saturated → m32 leg (the routed oracle's arm predicates)
        vals = ", ".join(
            f"('{k}', {r}, {np_}, {rec})" for k, r, np_, _, _, _, rec in sat
        )
        live = ", ".join(
            f"('{k}', {r}, {np_}, {rec})"
            for k, r, np_, _, _, _, rec in QL._IVFADC_RES_CURVE_CACHE.get(
                SF_DIR
            )
            or QL._ivfadc_ladder_exec(spark, SF_DIR, residual=True)
        )
        for res_vals, want in ((live, "residual_ivfadc"), (vals, "m32")):
            got_route = duckdb.sql(
                f"""
                WITH ladder(kind, rung, nprobe, recall_x10k) AS (
                  VALUES {vals}
                ), sized AS (
                  SELECT * FROM ladder WHERE recall_x10k >= 8500
                  ORDER BY nprobe, kind, rung LIMIT 1
                ), ladder_r(kind, rung, nprobe, recall_x10k) AS (
                  VALUES {res_vals}
                ), sized_r AS (
                  SELECT * FROM ladder_r WHERE recall_x10k >= 8500
                  ORDER BY nprobe, kind, rung LIMIT 1
                )
                SELECT CASE
                  WHEN EXISTS (SELECT 1 FROM sized) THEN 'flat'
                  WHEN EXISTS (SELECT 1 FROM sized_r) THEN 'residual_ivfadc'
                  ELSE 'm32' END AS route
                """
            ).fetchone()[0]
            assert got_route == want

    @pytest.mark.slow
    def test_xcorpus_full_probe_equals_flat_and_asset_reuse(self, spark):
        """The ingest-tier composition: at nprobe = k_cells the
        cell-pruned xcorpus miner must reproduce margin_mine_pq_xcorpus
        EXACTLY; sides must be contained (probes from NEW, neighbors
        from REF); and the persisted-asset path (quantizer + ref
        codebook/codes passed in) must be row-identical."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        new = emb.filter(F.col("vec_id") % 3 == 0).localCheckpoint()
        ref = emb.filter(F.col("vec_id") % 3 != 0).localCheckpoint()
        kc = math.isqrt(ref.count() - 1) + 1
        key = lambda r: tuple(r)
        flat = sorted(map(key, SIM.margin_mine_pq_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1, min_margin_x10k=11000
        ).collect()))
        full = sorted(map(key, SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, nprobe=kc, k_cells=kc, m=16, k_codes=16,
            iters=1, min_margin_x10k=11000,
        ).collect()))
        assert flat == full and flat
        # default (pruned) nprobe: sides contained, assets reusable
        mined = SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000,
        ).collect()
        assert mined
        new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
        ref_ids = {r["vec_id"] for r in ref.select("vec_id").collect()}
        assert {r["probe_id"] for r in mined} <= new_ids
        assert {r["best_id"] for r in mined} <= ref_ids
        _, cents = SIM.kmeans_fit_distributed(ref, k=kc, iters=1, round_dp=6)
        rnorm = SIM.normalize_rounded(ref, out_col="__nv").localCheckpoint()
        book = SIM.pq_fit(rnorm, dim=64, m=16, k_codes=16, iters=1, vec_col="__nv")
        codes = SIM.pq_encode(rnorm, book, dim=64, m=16, vec_col="__nv")
        reused = SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, centroids=cents,
            ref_codebook=book, ref_codes=codes,
        ).collect()
        assert sorted(map(key, reused)) == sorted(map(key, mined))

    def test_ivfadc_guards(self, spark):
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        with pytest.raises(ValueError, match="residency budget"):
            SIM.margin_mine_ivfadc(
                emb, dim=64, nprobe=2, k_cells=k, m=16, k_codes=16,
                iters=1, max_index_bytes=64,
            )
        with pytest.raises(ValueError, match="n_cell_shards"):
            SIM.margin_mine_ivfadc(
                emb, dim=64, nprobe=2, k_cells=k, m=16, k_codes=16,
                iters=1, n_cell_shards=0,
            )

    @pytest.mark.slow
    def test_cell_sharded_scan_bit_identical_and_beyond_residency(self, spark):
        """VERDICT r8 item 3: the cell-sharded IVFADC scan (cells
        hash-partitioned across broadcasts, per-shard top-C union,
        bounded (adc desc, nbr_id) re-merge) must be BIT-IDENTICAL to
        the unsharded scan — flat and residual encodings both — and
        must run where the unsharded scan's residency guard RAISES,
        with the budget set between the largest single shard and the
        full index (the exact regime the sharding exists for: past
        residency the pruning used to fall back to flat sharding)."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        for residual in (False, True):
            base = SIM.margin_mine_ivfadc(
                emb, dim=64, nprobe=(k + 1) // 2, k_cells=k, m=16,
                k_codes=16, iters=1, min_margin_x10k=11000,
                residual=residual,
            ).collect()
            sharded = SIM.margin_mine_ivfadc(
                emb, dim=64, nprobe=(k + 1) // 2, k_cells=k, m=16,
                k_codes=16, iters=1, min_margin_x10k=11000,
                residual=residual, n_cell_shards=3,
            ).collect()
            assert sorted(map(tuple, base)) == sorted(map(tuple, sharded))
            assert base, "vacuous bit-identity: miner returned no rows"
        # beyond-residency: budget below the full index but above every
        # shard — unsharded raises, sharded succeeds with identical rows
        n = emb.count()
        _, cents = SIM.kmeans_fit_distributed(emb, k=k, iters=1, round_dp=6)
        ranked = SIM.assign_cells_ranked(emb, cents, n=k)
        home = ranked.select("vec_id", F.element_at("cells", 1).alias("cell"))
        shards = 4
        shard_sizes = (
            home.groupBy(
                F.pmod(F.xxhash64(F.col("cell").cast("long")), F.lit(shards))
            )
            .count()
            .collect()
        )
        max_shard = max(r["count"] for r in shard_sizes)
        budget = (max_shard * (16 + 24)) + 1
        assert budget <= n * (16 + 24), "budget must sit below the full index"
        kwargs = dict(
            dim=64, nprobe=(k + 1) // 2, k_cells=k, m=16, k_codes=16,
            iters=1, min_margin_x10k=11000, centroids=cents,
            ranked_cells=ranked, max_index_bytes=budget,
        )
        with pytest.raises(ValueError, match="residency budget"):
            SIM.margin_mine_ivfadc(emb, **kwargs).collect()
        over = SIM.margin_mine_ivfadc(
            emb, n_cell_shards=shards, **kwargs
        ).collect()
        full = SIM.margin_mine_ivfadc(
            emb, dim=64, nprobe=(k + 1) // 2, k_cells=k, m=16, k_codes=16,
            iters=1, min_margin_x10k=11000, centroids=cents,
            ranked_cells=ranked,
        ).collect()
        assert sorted(map(tuple, over)) == sorted(map(tuple, full))

    @pytest.mark.slow
    def test_cell_sharded_serving_and_ingest_shapes(self, spark):
        """The n_cell_shards passthrough on the OTHER two production
        shapes: the serving kNN join and the incremental-ingest miner
        must be row-identical sharded vs not — the index an ingest
        pipeline or a serving fleet holds resident is exactly the one
        that outgrows a single broadcast first."""
        emb = load_table(spark, "embeddings", SF_DIR)
        queries = emb.filter(F.col("vec_id") % 97 == 0)
        base = emb.filter(F.col("vec_id") % 97 != 0)
        key = lambda r: tuple(r)
        j1 = sorted(map(key, SIM.ivfadc_knn_join(
            queries, base, dim=64, k=3, m=16, k_codes=16, iters=1,
        ).collect()))
        j2 = sorted(map(key, SIM.ivfadc_knn_join(
            queries, base, dim=64, k=3, m=16, k_codes=16, iters=1,
            n_cell_shards=3,
        ).collect()))
        assert j1 == j2 and j1
        new = emb.filter(F.col("vec_id") % 3 == 0)
        ref = emb.filter(F.col("vec_id") % 3 != 0)
        x1 = sorted(map(key, SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True,
        ).collect()))
        x2 = sorted(map(key, SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True, n_cell_shards=3,
        ).collect()))
        assert x1 == x2 and x1

    def test_residual_reconstruction_and_anchor_coverage(self, spark):
        """Residual algebra: every home cell has an anchor; the residual
        column is BIT-IDENTICAL to an independently-computed nv − anchor
        (IEEE subtraction is deterministic and correctly rounded — the
        property the DuckDB oracle replay rests on); and adding the
        anchor back reconstructs nv to within 1 ulp of unit scale
        ((b − a) + a is correctly rounded twice, not an identity)."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        norm = SIM.normalize_rounded(emb, out_col="__nv").localCheckpoint()
        _, cents = SIM.kmeans_fit_distributed(emb, k=k, iters=1, round_dp=6)
        ranked = SIM.assign_cells_ranked(emb, cents, n=1)
        home = ranked.select("vec_id", F.element_at("cells", 1).alias("cell"))
        anchors = SIM.cell_anchors(norm, home, vec_col="__nv")
        home_cells = {r["cell"] for r in home.select("cell").distinct().collect()}
        anchor_cells = {r["cell"] for r in anchors.collect()}
        assert home_cells == anchor_cells
        rv = SIM.residualize(
            norm.select("vec_id", "__nv"), home, anchors,
            vec_col="__nv", out_col="__rv",
        ).localCheckpoint()
        independent = (
            norm.select("vec_id", "__nv")
            .join(home, "vec_id")
            .join(anchors, "cell")
            .select(
                "vec_id",
                F.zip_with("__nv", "av", lambda x, a: x - a).alias("__ri"),
            )
        )
        diff_bits = (
            rv.join(independent, "vec_id")
            .filter(F.col("__rv") != F.col("__ri"))
            .count()
        )
        assert diff_bits == 0
        worst = (
            rv.join(home, "vec_id")
            .join(anchors, "cell")
            .select(
                F.aggregate(
                    F.zip_with(
                        F.zip_with("__rv", "av", lambda r, a: r + a),
                        F.col("__nv"),
                        lambda re, nv: F.abs(re - nv),
                    ),
                    F.lit(0.0),
                    lambda acc, d: F.greatest(acc, d),
                ).alias("err")
            )
            .agg(F.max("err"))
            .collect()[0][0]
        )
        assert worst <= 1e-12

    def test_residual_missing_anchor_raises(self, spark):
        """An anchor table that does not cover every occupied cell must
        raise, not silently skip cells (the staleness-guard convention
        of adc_shortlist_pairs)."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        norm = SIM.normalize_rounded(emb, out_col="__nv").localCheckpoint()
        _, cents = SIM.kmeans_fit_distributed(emb, k=k, iters=1, round_dp=6)
        ranked = SIM.assign_cells_ranked(emb, cents, n=k).localCheckpoint()
        home = ranked.select("vec_id", F.element_at("cells", 1).alias("cell"))
        anchors = SIM.cell_anchors(norm, home, vec_col="__nv").localCheckpoint()
        first_cell = anchors.select("cell").orderBy("cell").first()["cell"]
        truncated = anchors.filter(F.col("cell") != first_cell)
        rv = SIM.residualize(
            norm.select("vec_id", "__nv"), home, anchors,
            vec_col="__nv", out_col="__rv",
        )
        book = SIM.pq_fit(rv, dim=64, m=16, k_codes=16, iters=1, vec_col="__rv")
        codes = SIM.pq_encode(rv, book, dim=64, m=16, vec_col="__rv")
        probes = norm.select("vec_id", "label", "__nv").join(
            ranked.select("vec_id", F.slice("cells", 1, 2).alias("__cells")),
            "vec_id",
        )
        with pytest.raises(ValueError, match="missing anchors"):
            SIM.ivfadc_shortlist_pairs(
                probes, book, codes, home, shortlist=8, dim=64, m=16,
                anchors_df=truncated,
            ).count()

    def test_residual_recall_dominates_flat_at_top_rung(self, spark):
        """The point of residual encoding (Jégou §III): at the SAME
        scanned-cell budget, finer quantization of the small-spread
        residuals ranks better. Measured at the top rung (every cell
        probed — pure encoding comparison, no pruning noise): residual
        recall must be >= flat recall on this corpus (0.969 vs 0.939
        at sf0.001), and both mine non-empty sets."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        k = math.isqrt(emb.count() - 1) + 1
        brute = set(map(tuple, SIM.margin_mine(emb, min_margin_x10k=11000)
                        .select("probe_id", "best_id").collect()))
        flat = set(map(tuple, SIM.margin_mine_ivfadc(
            emb, dim=64, nprobe=k, k_cells=k, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000,
        ).select("probe_id", "best_id").collect()))
        res = set(map(tuple, SIM.margin_mine_ivfadc(
            emb, dim=64, nprobe=k, k_cells=k, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True,
        ).select("probe_id", "best_id").collect()))
        assert brute and flat and res
        assert len(res & brute) >= len(flat & brute)

    @pytest.mark.slow
    def test_residual_xcorpus_sides_and_asset_reuse(self, spark):
        """The asymmetric residual shapes: sides contained (probes from
        NEW, neighbors from REF), and the persisted-asset path (anchors
        + residual codebook/codes passed in) row-identical to the
        self-fit path — the contract that makes the anchor table a
        persistable serving asset next to the codes."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        new = emb.filter(F.col("vec_id") % 3 == 0).localCheckpoint()
        ref = emb.filter(F.col("vec_id") % 3 != 0).localCheckpoint()
        kc = math.isqrt(ref.count() - 1) + 1
        key = lambda r: tuple(r)
        mined = SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True,
        ).collect()
        assert mined
        new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
        ref_ids = {r["vec_id"] for r in ref.select("vec_id").collect()}
        assert {r["probe_id"] for r in mined} <= new_ids
        assert {r["best_id"] for r in mined} <= ref_ids
        _, cents = SIM.kmeans_fit_distributed(ref, k=kc, iters=1, round_dp=6)
        home = SIM.assign_cells_ranked(ref, cents, n=1).select(
            "vec_id", F.element_at("cells", 1).alias("cell")
        )
        rnorm = SIM.normalize_rounded(ref, out_col="__nv").localCheckpoint()
        anchors = SIM.cell_anchors(rnorm, home, vec_col="__nv").localCheckpoint()
        rv = SIM.residualize(
            rnorm.select("vec_id", "__nv"), home, anchors,
            vec_col="__nv", out_col="__rv",
        )
        book = SIM.pq_fit(rv, dim=64, m=16, k_codes=16, iters=1, vec_col="__rv")
        codes = SIM.pq_encode(rv, book, dim=64, m=16, vec_col="__rv")
        reused = SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True, centroids=cents,
            ref_codebook=book, ref_codes=codes, ref_anchors=anchors,
        ).collect()
        assert sorted(map(key, reused)) == sorted(map(key, mined))

    def test_ivfadc_stale_persisted_index_raises(self, spark):
        """The cell-pruned family's staleness guard (the
        adc_shortlist_pairs convention threaded through r8 review): a
        persisted code index missing newly-ingested reference rows must
        RAISE, never silently scan only the intersection."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        new = emb.filter(F.col("vec_id") % 3 == 0).localCheckpoint()
        ref = emb.filter(F.col("vec_id") % 3 != 0).localCheckpoint()
        # index built on a STALE subset of ref (simulating later ingest)
        stale_ref = ref.filter(F.col("vec_id") % 5 != 0).localCheckpoint()
        kc = math.isqrt(ref.count() - 1) + 1
        _, cents = SIM.kmeans_fit_distributed(ref, k=kc, iters=1, round_dp=6)
        snorm = SIM.normalize_rounded(stale_ref, out_col="__nv").localCheckpoint()
        book = SIM.pq_fit(snorm, dim=64, m=16, k_codes=16, iters=1, vec_col="__nv")
        stale_codes = SIM.pq_encode(snorm, book, dim=64, m=16, vec_col="__nv")
        with pytest.raises(ValueError, match="stale IVFADC index"):
            SIM.margin_mine_ivfadc_xcorpus(
                new, ref, dim=64, m=16, k_codes=16, iters=1,
                min_margin_x10k=11000, centroids=cents,
                ref_codebook=book, ref_codes=stale_codes,
            ).count()

    @pytest.mark.slow
    def test_ivfadc_index_lifecycle_roundtrip(self, spark, tmp_path):
        """The FULL persisted IVFADC serving asset set (quantizer + home
        cells + codebook + codes + anchors — what FAISS writes for an
        IndexIVFPQ): save, load, and mine with every part loaded —
        row-identical to the self-fit run, with NO per-call home
        recompute. A root missing a required part must raise."""
        import math

        emb = load_table(spark, "embeddings", SF_DIR)
        new = emb.filter(F.col("vec_id") % 3 == 0).localCheckpoint()
        ref = emb.filter(F.col("vec_id") % 3 != 0).localCheckpoint()
        kc = math.isqrt(ref.count() - 1) + 1
        _, cents = SIM.kmeans_fit_distributed(ref, k=kc, iters=1, round_dp=6)
        home = SIM.assign_cells_ranked(ref, cents, n=1).select(
            "vec_id", F.element_at("cells", 1).alias("cell")
        )
        rnorm = SIM.normalize_rounded(ref, out_col="__nv").localCheckpoint()
        anchors = SIM.cell_anchors(rnorm, home, vec_col="__nv").localCheckpoint()
        rv = SIM.residualize(
            rnorm.select("vec_id", "__nv"), home, anchors,
            vec_col="__nv", out_col="__rv",
        )
        book = SIM.pq_fit(rv, dim=64, m=16, k_codes=16, iters=1, vec_col="__rv")
        codes = SIM.pq_encode(rv, book, dim=64, m=16, vec_col="__rv")
        root = str(tmp_path / "ivfadc_idx")
        SIM.ivfadc_index_save(cents, home, book, codes, root, anchors_df=anchors)
        idx = SIM.ivfadc_index_load(spark, root)
        assert set(idx) == {"centroids", "home", "codebook", "codes", "anchors"}
        key = lambda r: tuple(r)
        fresh = sorted(map(key, SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True,
        ).collect()))
        loaded = sorted(map(key, SIM.margin_mine_ivfadc_xcorpus(
            new, ref, dim=64, m=16, k_codes=16, iters=1,
            min_margin_x10k=11000, residual=True,
            centroids=idx["centroids"], ref_codebook=idx["codebook"],
            ref_codes=idx["codes"], ref_anchors=idx["anchors"],
            ref_home=idx["home"],
        ).collect()))
        assert fresh == loaded and fresh
        # a non-residual save omits anchors; load succeeds without them
        root2 = str(tmp_path / "ivfadc_idx_flat")
        SIM.ivfadc_index_save(cents, home, book, codes, root2)
        assert "anchors" not in SIM.ivfadc_index_load(spark, root2)
        # a root missing a REQUIRED part raises
        import shutil

        shutil.rmtree(f"{root2}/codes")
        with pytest.raises(ValueError, match="missing its 'codes'"):
            SIM.ivfadc_index_load(spark, root2)

    def test_residual_knn_join_recall(self, spark):
        """The residual serving join holds the same recall bar as the
        flat one against the exact kNN reference."""
        from dais2021imageprocessingondeltalake_spark.operators.similarity import (
            ivfadc_knn_join,
            knn_join,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        probe = F.col("vec_id") % 97 == 0
        queries = emb.filter(probe).localCheckpoint()
        base = emb.filter(~probe).localCheckpoint()
        exact = {
            (r.probe_id, r.nbr_id)
            for r in knn_join(emb, k=3, probe_filter=probe).collect()
            if r.nbr_id % 97 != 0
        }
        got = {
            (r["query_id"], r["base_id"])
            for r in ivfadc_knn_join(
                queries, base, dim=64, k=3, m=16, k_codes=16, iters=1,
                residual=True,
            ).collect()
        }
        recall = len(got & exact) / max(len(exact), 1)
        assert recall >= 0.7, f"residual ivfadc_knn_join recall {recall:.2f}"

    def test_residual_curve_sized_consistent_and_not_worse(self, spark):
        """The residual ladder mirrors the flat ladder's invariants on
        the r9 mixed rung family (full family present, duplicate-nprobe
        rungs identical, monotone scanned budget, non-decreasing
        recall, top rung scans all N² codes, sized row = minimum-nprobe
        rung clearing the floor) AND certifies the upgrade: the
        residual sized NPROBE is never above the flat sized nprobe on
        the same corpus — residual encoding buys scan budget."""
        from dais2021imageprocessingondeltalake_spark import queries_all as q

        curve = q.REGISTRY["q_margin_ivfadc_res_curve"].fn(spark, SF_DIR).collect()
        assert sorted((r["kind"], r["rung"]) for r in curve) == sorted(
            (k, s) for k, s in SIM.IVFADC_RUNGS
        )
        n = load_table(spark, "embeddings", SF_DIR).count()
        by_np = {}
        for r in curve:
            stats = (r["n_scanned"], r["n_mined"], r["n_hit"], r["recall_x10k"])
            assert by_np.setdefault(r["nprobe"], stats) == stats
        distinct = [by_np[np_] for np_ in sorted(by_np)]
        assert distinct[-1][0] == n * n
        for a, b in zip(distinct, distinct[1:]):
            assert a[0] < b[0]
            assert a[3] <= b[3]
        sized = q.REGISTRY["q_margin_ivfadc_res_sized"].fn(spark, SF_DIR).collect()[0]
        assert sized["reached"]
        kind, rung, np_ = SIM.size_ivfadc_rung(
            [(r["kind"], r["rung"], r["nprobe"], r["recall_x10k"]) for r in curve]
        )
        assert (sized["sized_kind"], sized["sized_rung"]) == (kind, rung)
        assert sized["sized_nprobe"] == np_
        flat_sized = q.REGISTRY["q_margin_ivfadc_sized"].fn(spark, SF_DIR).collect()[0]
        assert sized["sized_nprobe"] <= flat_sized["sized_nprobe"]


class TestCodeBudgetSizing:
    """The m (code bytes) sizing axis (r9): the curve, monotonicity,
    and the production-constant lockstep — the third measured knob
    after nprobe and C."""

    def test_m_curve_monotone_and_sized_lockstep(self, spark):
        """Recall must be non-decreasing in the byte budget (finer
        subspaces quantize tighter at the same k_codes); the sized
        decision is the smallest rung clearing the floor; and the
        production m = 16 must sit ON its own corpus's measured curve
        at-or-above the floor — the no-drift convention of
        q_margin_c_sized applied to m."""
        from dais2021imageprocessingondeltalake_spark import queries_all as q
        from dais2021imageprocessingondeltalake_spark.queries_llm import (
            _MARGIN_PQ_M,
            _PQ_M_LADDER,
        )

        curve = sorted(
            q.REGISTRY["q_margin_pq_m_curve"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["code_bytes"],
        )
        assert [r["code_bytes"] for r in curve] == list(_PQ_M_LADDER)
        for a, b in zip(curve, curve[1:]):
            assert a["recall_x10k"] <= b["recall_x10k"]
        # all rungs rank at the SAME production shortlist C
        assert len({r["c_short"] for r in curve}) == 1
        sized = q.REGISTRY["q_margin_m_sized"].fn(spark, SF_DIR).collect()[0]
        assert sized["reached"]
        first = next(r for r in curve if r["recall_x10k"] >= 8500)
        assert sized["sized_m"] == first["code_bytes"]
        prod = next(r for r in curve if r["code_bytes"] == _MARGIN_PQ_M)
        assert sized["prod_recall_x10k"] == prod["recall_x10k"]
        assert sized["prod_meets_target"] == (prod["recall_x10k"] >= 8500)
        # the curve must actually discriminate: m=8 measured below m=32
        assert curve[0]["recall_x10k"] < curve[-1]["recall_x10k"]


class TestShortlistSizing:
    """Recall-targeted C sizing (r8, VERDICT r7 items 3+4): the curve,
    the sizing function, and the no-drift lockstep between the measured
    curve and the production rule the composites run."""

    def test_size_adc_mult_reads_curve(self):
        curve = [(1, 8996), (2, 9628), (3, 9851)]
        assert SIM.size_adc_mult(curve, 8500) == 1
        assert SIM.size_adc_mult(curve, 9700) == 3
        assert SIM.size_adc_mult(curve, 9900) is None
        assert SIM.size_adc_mult([{"mult": 2, "recall_x10k": 9000}], 8500) == 2
        with pytest.raises(ValueError, match="positional rows"):
            SIM.size_adc_mult([(1, 2, 3)], 8500)
        with pytest.raises(KeyError):
            SIM.size_adc_mult([{"m": 1, "recall_x10k": 9000}], 8500)

    def test_curve_monotone_and_production_lockstep(self, spark):
        """Recall must be non-decreasing in C; the mult-2 rung must be
        EXACTLY the C that size_adc_shortlist (what margin_mine_pq and
        every PQ composite defaults to) computes for this corpus; and
        the certified decision row must agree with the curve — so the
        production sizing can never silently drift off the measured,
        certified operating point."""
        from dais2021imageprocessingondeltalake_spark import queries_all as q

        curve = sorted(
            q.REGISTRY["q_margin_pq_c_curve"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["mult"],
        )
        assert [r["mult"] for r in curve] == [1, 2, 3]
        for a, b in zip(curve, curve[1:]):
            assert a["c_short"] < b["c_short"]
            assert a["recall_x10k"] <= b["recall_x10k"]
        n = load_table(spark, "embeddings", SF_DIR).count()
        prod = next(r for r in curve if r["mult"] == 2)
        assert prod["c_short"] == SIM.size_adc_shortlist(n)
        sized = q.REGISTRY["q_margin_c_sized"].fn(spark, SF_DIR).collect()[0]
        assert sized["reached"] and sized["prod_meets_target"]
        assert sized["prod_recall_x10k"] == prod["recall_x10k"]
        assert sized["sized_mult"] <= sized["prod_mult"]
        first = next(r for r in curve if r["recall_x10k"] >= 8500)
        assert sized["sized_mult"] == first["mult"]
        assert sized["sized_c"] == first["c_short"]


def test_bigram_ppl_flags_word_salad(spark):
    """The bigram LM must separate coherent repetition from word salad:
    shuffled-adjacency text (same tokens, scrambled order) scores a
    lower mean bigram logprob than text whose bigrams repeat across the
    corpus — the signal unigram scoring cannot see (identical unigram
    distributions!)."""
    from dais2021imageprocessingondeltalake_spark.operators import text as TX

    coherent = "the cat sat on the mat"
    rows = [(i, coherent) for i in range(10)]
    # same 6 tokens, adjacency scrambled differently per doc: each
    # bigram is near-unique in the corpus
    salads = ["mat the on cat the sat", "sat mat the on the cat",
              "on the mat sat cat the", "the on sat the cat mat"]
    rows += [(100 + i, s) for i, s in enumerate(salads)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["avg_logprob"] for r in TX.bigram_logprob_score(df).collect()}
    worst_coherent = min(got[i] for i in range(10))
    best_salad = max(got[100 + i] for i in range(len(salads)))
    assert best_salad < worst_coherent, (best_salad, worst_coherent)


def test_vocab_coverage_monotone_and_bounded(spark):
    """Coverage must be non-decreasing in vocab size, bounded by 1.0,
    and covered tokens can never exceed the total."""
    from dais2021imageprocessingondeltalake_spark import queries_all as q

    rows = sorted(
        q.REGISTRY["q_vocab_coverage"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["vocab_size"],
    )
    assert rows
    prev = -1
    for r in rows:
        assert r["covered_tokens"] <= r["total_tokens"]
        assert 0 <= r["coverage_x10k"] <= 10000
        assert r["coverage_x10k"] >= prev
        prev = r["coverage_x10k"]


def test_oov_rate_planted_unseen_tokens(spark):
    """Tokens planted only in odd (held-out) docs must count as OOV;
    a corpus whose halves share every type reports zero."""
    from dais2021imageprocessingondeltalake_spark import queries_all as q

    shared = [(i, "alpha beta gamma", "xx") for i in range(6)]
    df = spark.createDataFrame(shared, ["doc_id", "text", "lang"])
    df.createOrReplaceTempView("__t")
    # reuse the registered operator logic directly on a planted frame
    from pyspark.sql import functions as F

    def oov(frame):
        train = (
            frame.filter(F.col("doc_id") % 2 == 0)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .distinct()
            .withColumn("__seen", F.lit(1))
        )
        test_tok = frame.filter(F.col("doc_id") % 2 == 1).select(
            "lang", F.explode(F.split("text", " ")).alias("t")
        )
        return (
            test_tok.join(train, "t", "left")
            .groupBy("lang")
            .agg(
                F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0)).alias("n_oov")
            )
        )

    assert oov(df).collect()[0]["n_oov"] == 0
    planted = spark.createDataFrame(
        shared + [(7, "alpha zzzunseen qqqnovel", "xx")],
        ["doc_id", "text", "lang"],
    )
    assert oov(planted).collect()[0]["n_oov"] == 2


class TestShardManifest:
    def test_fingerprint_is_partitioning_invariant(self, spark, sf_dir):
        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            epoch_shuffle,
            shard_manifest,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = epoch_shuffle(docs, "doc_id", epochs=1, n_shards=4)
        m1 = {
            (r["epoch"], r["shard"]): r["fingerprint"]
            for r in shard_manifest(sh, None, "doc_id").collect()
        }
        m2 = {
            (r["epoch"], r["shard"]): r["fingerprint"]
            for r in shard_manifest(sh.repartition(13), None, "doc_id").collect()
        }
        assert m1 == m2 and len(m1) == 4

    def test_fingerprint_flips_on_membership_change(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            epoch_shuffle,
            shard_manifest,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = epoch_shuffle(docs, "doc_id", epochs=1, n_shards=4)
        full = {
            (r["epoch"], r["shard"]): r["fingerprint"]
            for r in shard_manifest(sh, None, "doc_id").collect()
        }
        # drop one document: exactly that doc's shard fingerprint changes
        victim = sh.orderBy("position").first()
        pruned = sh.filter(F.col("doc_id") != victim["doc_id"])
        part = {
            (r["epoch"], r["shard"]): r["fingerprint"]
            for r in shard_manifest(pruned, None, "doc_id").collect()
        }
        changed = {k for k in full if full[k] != part.get(k)}
        assert changed == {(victim["epoch"], victim["shard"])}


class TestNegativeSample:
    def test_deterministic_and_no_self_pairs(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            negative_sample,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        anchors = docs.filter(F.col("doc_id") % 100 == 0)
        a = sorted(map(tuple, negative_sample(docs, anchors, "doc_id", k=3).collect()))
        b = sorted(
            map(
                tuple,
                negative_sample(
                    docs.repartition(11), anchors, "doc_id", k=3
                ).collect(),
            )
        )
        assert a == b and len(a) > 0
        assert all(anchor != neg for anchor, _j, neg in a)
        assert {j for _a, j, _n in a} <= {1, 2, 3}


class TestShardManifestPayload:
    def test_incomplete_payload_keeps_membership(self, spark, sf_dir):
        """A payload missing ids must NOT narrow the manifest: n_docs and
        the XOR fingerprint attest the shuffle output's membership; only
        the weight sum shrinks (left join, NULL weight skipped)."""
        from pyspark.sql import functions as F

        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            epoch_shuffle,
            shard_manifest,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = epoch_shuffle(docs, "doc_id", epochs=1, n_shards=4)
        full_payload = docs.select("doc_id", "n_chars")
        half_payload = full_payload.filter(F.col("doc_id") % 2 == 0)
        full = {
            (r["epoch"], r["shard"]): (r["n_docs"], r["fingerprint"])
            for r in shard_manifest(sh, full_payload, "doc_id", "n_chars").collect()
        }
        part = {
            (r["epoch"], r["shard"]): (r["n_docs"], r["fingerprint"])
            for r in shard_manifest(sh, half_payload, "doc_id", "n_chars").collect()
        }
        assert full == part  # membership facts identical despite missing payload


class TestMarginMineIVF:
    def test_assign_topn_rejects_out_of_contract_n(self, spark):
        """ADVICE r6: n=0 silently emitted zero rows and n<0 truncated
        ranks from the argsort TAIL — both must raise like the sibling
        operators' (pack_sequences, logreg_fit_distributed) validation."""
        emb = load_table(spark, "embeddings", SF_DIR)
        _, cents = SIM.kmeans_fit_distributed(emb, k=4, iters=1, round_dp=6)
        for bad in (0, -1):
            with pytest.raises(ValueError):
                SIM.assign_topn_centroids(emb, cents, n=bad)

    def test_assign_topn_rank1_matches_assign_to_centroids(self, spark):
        """The top-n E-step's rank-1 row must reproduce the single-
        assignment E-step exactly (same rounding, same lowest-label tie
        rule) — rank 1 IS the home cell the candidate join keys on."""
        emb = load_table(spark, "embeddings", SF_DIR)
        _, cents = SIM.kmeans_fit_distributed(emb, k=8, iters=1, round_dp=6)
        single = {
            r["vec_id"]: r["assigned_label"]
            for r in SIM.assign_to_centroids(emb, cents).collect()
        }
        top = SIM.assign_topn_centroids(emb, cents, n=2).collect()
        rank1 = {r["vec_id"]: r["assigned_label"] for r in top if r["rank"] == 1}
        assert rank1 == single
        # exactly min(n, k) rows per vector, ranks contiguous from 1,
        # distinct cells per vector
        by_vec: dict = {}
        for r in top:
            by_vec.setdefault(r["vec_id"], []).append(r)
        for vid, rows in by_vec.items():
            assert sorted(x["rank"] for x in rows) == [1, 2], vid
            assert len({x["assigned_label"] for x in rows}) == 2, vid
            sims = {x["rank"]: x["sim"] for x in rows}
            assert sims[1] >= sims[2], vid

    def test_near_mate_corpus_recall_is_high(self, spark):
        """The budget-contract miner's recall claim cuts both ways: on a
        NEAR-mate corpus (cross-group mates nearly identical, sites far
        apart — the aligned-encoder bitext geometry) the home cells
        concentrate the mates and IVF recall must be high, even though
        the same operator measures 0.32-0.36 on the far-mate synthetic
        corpus (q_margin_ivf_recall). Deterministic constructed corpus."""
        import math

        rows = []
        # TWO groups per site: a probe's best cross-group neighbor is its
        # site mate (cosine ~0.999) and its second-best is in a far site,
        # so the ratio margin is large and the pair survives the filter
        # (three groups per site would put sim2 ~ sim1 and kill them all).
        # Sites are one-hot ORTHOGONAL directions (dim > n_sites) plus a
        # small shared component: cross-site cosine is ~0.04 — positive
        # (sim2 > 0 must hold for the ratio) but far below the mate's.
        n_sites, n_groups, dim = 30, 2, 32
        for site in range(n_sites):
            base = [0.0] * dim
            base[site] = 1.0
            base[dim - 1] = 0.2
            for g in range(n_groups):
                v = list(base)
                # tiny per-group jitter keeps mates at cosine ~0.999
                v[(site + g + 1) % (dim - 1)] += 0.01 * (g + 1)
                rows.append((site * n_groups + g, f"g{g}", v))
        df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
        k = int(math.ceil(math.sqrt(len(rows))))
        exact = {
            r["probe_id"]: r["best_id"]
            for r in SIM.margin_mine(df, min_margin_x10k=10200).collect()
        }
        approx = {
            r["probe_id"]: r["best_id"]
            for r in SIM.margin_mine_ivf(
                df, k=k, iters=1, nprobe=2, min_margin_x10k=10200
            ).collect()
        }
        assert exact, "constructed corpus produced no high-margin pairs"
        hit = sum(1 for p, b in exact.items() if approx.get(p) == b)
        recall = hit / len(exact)
        assert recall >= 0.9, f"near-mate IVF recall = {recall:.2f}"

    def test_recall_report_row_is_internally_consistent(self, spark):
        """The certified report's arithmetic must hold: n_hit bounded by
        both sides, recall_x10k = floor(1e4·n_hit/n_brute), meets_floor
        consistent with the emitted floor (the floor is a regression
        guard at measured-minus-slack, NOT a quality contract — the
        far-mate corpus measures ~0.32-0.36)."""
        from dais2021imageprocessingondeltalake_spark.queries_llm import (
            q_margin_ivf_recall,
        )

        from .conftest import SF_DIR_MID

        row = q_margin_ivf_recall(spark, SF_DIR_MID).collect()[0]
        assert row["n_hit"] <= min(row["n_brute"], row["n_ivf"])
        assert row["recall_x10k"] == (10000 * row["n_hit"]) // row["n_brute"]
        assert row["floor_x10k"] == 3000
        assert row["meets_floor"] == (row["recall_x10k"] >= 3000)
        assert row["meets_floor"] is True, row


class TestPackSequences:
    def test_sequences_full_and_spans_partition_docs(self, spark):
        """Concat-and-chunk invariants: (1) every sequence except the
        last is EXACTLY full (zero padding waste by construction);
        (2) a document's spans partition [0, len) — contiguous,
        non-overlapping, covering; (3) within a sequence, spans tile
        [0, capacity) via pos_in_seq."""
        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            pack_sequences,
        )

        docs = load_table(spark, "documents", SF_DIR)
        toks = docs.select("doc_id", F.size(F.split("text", " ")).alias("n"))
        cap = 512
        spans = pack_sequences(toks, "doc_id", "n", capacity=cap).collect()
        assert spans
        per_seq: dict = {}
        per_doc: dict = {}
        for r in spans:
            per_seq.setdefault(r["seq_id"], []).append(r)
            per_doc.setdefault(r["doc_id"], []).append(r)
        last_seq = max(per_seq)
        for sid, rows in per_seq.items():
            total = sum(x["n_tok"] for x in rows)
            if sid != last_seq:
                assert total == cap, (sid, total)
            else:
                assert 0 < total <= cap, (sid, total)
            # spans tile the sequence: sorted pos_in_seq is contiguous
            tile = sorted((x["pos_in_seq"], x["pos_in_seq"] + x["n_tok"]) for x in rows)
            assert tile[0][0] == 0
            for (a0, a1), (b0, _b1) in zip(tile, tile[1:]):
                assert a1 == b0, (sid, tile)
        lens = {
            r["doc_id"]: r["n"]
            for r in toks.filter(F.col("n") > 0).collect()
        }
        assert set(per_doc) == set(lens)
        for did, rows in per_doc.items():
            cover = sorted((x["doc_from"], x["doc_to"]) for x in rows)
            assert cover[0][0] == 0 and cover[-1][1] == lens[did], did
            for (a0, a1), (b0, _b1) in zip(cover, cover[1:]):
                assert a1 == b0, (did, cover)

    def test_parallel_prefix_sum_matches_serial(self, spark):
        """The two-pass distributed scan must equal the serial running
        sum for any partitioning (integer values sum associatively)."""
        from dais2021imageprocessingondeltalake_spark.operators.sort import (
            parallel_prefix_sum,
        )

        df = spark.range(0, 2000).select(
            F.col("id"), ((F.col("id") * 7919) % 23 + 1).alias("v")
        ).repartition(13)
        got = {
            r["id"]: r["offset"]
            for r in parallel_prefix_sum(df, ["id"], "v", num_partitions=7).collect()
        }
        acc = 0
        for i in range(2000):
            assert got[i] == acc, (i, got[i], acc)
            acc += i * 7919 % 23 + 1

    def test_capacity_validated(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.sampling import (
            pack_sequences,
        )

        df = spark.createDataFrame([(1, 4)], ["doc_id", "n"])
        with pytest.raises(ValueError):
            pack_sequences(df, "doc_id", "n", capacity=0)


class TestLogregFit:
    def test_learns_a_separable_rule(self, spark):
        """On linearly separable data the GD trajectory must reach high
        training accuracy — the fit is a real trainer, not a replay
        artifact. Deterministic grid data, no RNG."""
        from dais2021imageprocessingondeltalake_spark.operators.linear import (
            logreg_fit_distributed,
            logreg_score,
        )

        rows = [
            (i, (i % 21 - 10) / 5.0, ((i * 7) % 13 - 6) / 6.0)
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, ["id", "a", "b"]).withColumn(
            "y", (F.col("a") + F.col("b") > 0).cast("int")
        )
        w = logreg_fit_distributed(df, ["a", "b"], "y", iters=25, lr=2.0)
        pred = df.withColumn("p", logreg_score(w))
        acc = (
            pred.filter(F.col("p") == (F.col("y") == 1)).count() / pred.count()
        )
        assert acc >= 0.95, f"training accuracy {acc:.3f}, weights {w}"

    def test_gradient_step_direction_and_determinism(self, spark):
        """One iteration from w=0: p=0.5 everywhere, so the intercept
        gradient is exactly round(avg(0.5 - y), 6) — closed-form
        checkable; and a rerun reproduces identical weights (pure
        function of the data)."""
        from dais2021imageprocessingondeltalake_spark.operators.linear import (
            logreg_fit_distributed,
        )

        df = spark.createDataFrame(
            [(i, float(i % 3), 1 if i % 4 == 0 else 0) for i in range(100)],
            ["id", "a", "y"],
        )
        w1 = logreg_fit_distributed(df, ["a"], "y", iters=1, lr=1.0)
        w2 = logreg_fit_distributed(df, ["a"], "y", iters=1, lr=1.0)
        assert w1 == w2
        y_mean = 25 / 100
        assert dict(w1)["intercept"] == -round(0.5 - y_mean, 6)

    def test_iters_validated(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.linear import (
            logreg_fit_distributed,
        )

        df = spark.createDataFrame([(1.0, 1)], ["a", "y"])
        with pytest.raises(ValueError):
            logreg_fit_distributed(df, ["a"], "y", iters=0)


class TestLogregGrid:
    def test_grid_rows_and_loss_sanity(self, spark):
        """One row per lr; every loss finite, positive, and no worse
        than the w=0 baseline loss ln(2) by much (3 GD steps from zero
        should not diverge on bounded features); validation rejects
        non-integer rates (the 6dp-grid closure contract)."""
        import math

        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.linear import (
            logreg_grid_search,
        )

        docs = load_table(spark, "documents", SF_DIR)
        ntok = F.size(F.split("text", " "))
        feats = docs.select(
            (F.col("lang") == "en").cast("int").alias("y"),
            (F.col("n_chars") / F.lit(1000.0)).alias("chars_k"),
            (ntok / F.lit(100.0)).alias("toks_h"),
        )
        grid = logreg_grid_search(
            feats, ["chars_k", "toks_h"], "y", lrs=[1, 2, 4], iters=3
        ).collect()
        assert sorted(r["lr"] for r in grid) == [1, 2, 4]
        for r in grid:
            assert math.isfinite(r["loss"]) and 0 < r["loss"] < 2.0, r
        with pytest.raises(ValueError):
            logreg_grid_search(feats, ["chars_k"], "y", lrs=[1, 2.5])
        with pytest.raises(ValueError):
            logreg_grid_search(feats, ["chars_k"], "y", lrs=[])


@pytest.mark.slow
def test_margin_ivf_curve_is_monotone(spark):
    """Sensitivity-curve invariants. STRUCTURAL: the candidate budget
    is non-decreasing in nprobe (top-n cells are a superset of top-n-1,
    so the candidate set only grows). EMPIRICAL-ON-THIS-CORPUS (pinned
    by determinism, not guaranteed by superset algebra — a larger
    candidate set raises sim2 and can flip the margin FILTER): the hit
    count is non-decreasing too, which is the whole point of paying a
    bigger budget and what a deployment reads the curve for."""
    from dais2021imageprocessingondeltalake_spark.queries_llm import (
        q_margin_ivf_curve,
    )

    from .conftest import SF_DIR_MID

    rows = sorted(
        (r.asDict() for r in q_margin_ivf_curve(spark, SF_DIR_MID).collect()),
        key=lambda r: r["nprobe"],
    )
    from dais2021imageprocessingondeltalake_spark.queries_llm import (
        _MARGIN_IVF_NPROBES,
    )

    assert [r["nprobe"] for r in rows] == sorted(_MARGIN_IVF_NPROBES)
    assert max(_MARGIN_IVF_NPROBES) >= 16, (
        "VERDICT r6 item 2: the certified ladder must measure the upper "
        "arm of the frontier, not stop at nprobe=4"
    )
    for a, b in zip(rows, rows[1:]):
        assert b["n_cand"] >= a["n_cand"], (a, b)
        assert b["n_hit"] >= a["n_hit"], (a, b)


def test_logreg_holdout_losses_close(spark):
    """3 GD steps on 3 bounded features cannot overfit: the held-out
    loss must be within 25% of the train loss, and both below the w=0
    baseline ln(2) + slack."""
    import math

    from dais2021imageprocessingondeltalake_spark.queries_llm import (
        q_logreg_holdout,
    )

    from .conftest import SF_DIR_MID

    row = q_logreg_holdout(spark, SF_DIR_MID).collect()[0]
    assert row["n_train"] + row["n_valid"] > 0
    assert 0 < row["train_loss"] < math.log(2) + 0.1
    assert abs(row["valid_loss"] - row["train_loss"]) <= 0.25 * row["train_loss"], row


def test_logreg_calibration_partitions_corpus(spark):
    """The reliability table must partition the corpus exactly: bin
    counts sum to |docs|, positives sum to the global positive count,
    and every bin satisfies 0 <= n_pos <= n."""
    from dais2021imageprocessingondeltalake_spark.queries_llm import (
        q_logreg_calibration,
    )

    docs = load_table(spark, "documents", SF_DIR)
    rows = q_logreg_calibration(spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == docs.count()
    assert sum(r["n_pos"] for r in rows) == docs.filter("lang = 'en'").count()
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"], r
        assert -5 <= r["z_bin"] <= 4, r
