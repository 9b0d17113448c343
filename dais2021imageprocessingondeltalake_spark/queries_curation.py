"""Corpus-curation query registrations (north-star tier, round 2):
benchmark decontamination, deterministic hash sampling / domain mixing
(rate-based and exactly-k), BM25 scoring, mergeable histogram-quantile
rollups, incremental cross-corpus dedup, duplicate-span removal,
distributed k-means (centroids + assignment), the end-to-end curation
composite, and the corpus mix report. Everything here is fully
deterministic (no engine-private hash functions), so every query
carries a complete DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import aggregates as AGG
from .operators import diversity as DIV
from .operators import sampling as S
from .operators.sampling import local_rows_df
from .operators import text as TX
from .registry import query

# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------
# The "benchmark" stands in for an eval suite: every 97th document. The
# scored corpus is everything else. 5-gram overlap is the GPT-3/PaLM-style
# contamination test.
_DECON_N = 5

@query(
    "q_decontaminate",
    headline=True,
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+{_DECON_N - 1}], ' ')
                            for i in range(1, len(w) - {_DECON_N - 2})]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0
    ), hits AS (
      SELECT e.doc_id, count(*) AS n_hits
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 <> 0) e
      JOIN bench USING (s)
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 97 <> 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing any
    5-gram with the benchmark slice (doc_id % 97 == 0). The benchmark's
    distinct shingle set broadcasts — corpus data never shuffles for the
    match, only the per-doc hit count aggregates. This is the op every
    production pretraining pipeline runs before training."""
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return TX.benchmark_ngram_overlap(corpus, bench, n=_DECON_N)


# --------------------------------------------------------------------------
# Deterministic hash sampling / domain mixing
# --------------------------------------------------------------------------
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1

def _thr(rate: float) -> str:
    return S._md5_threshold(min(rate, 1.0))

@query(
    "q_hash_sample",
    oracle=f"""
    WITH thr AS (
      SELECT doc_id, source,
             CASE source
               WHEN 'src0' THEN '{_thr(1.0)}'
               WHEN 'src1' THEN '{_thr(0.5)}'
               WHEN 'src2' THEN '{_thr(0.25)}'
               ELSE '{_thr(_MIX_DEFAULT)}'
             END AS t
      FROM documents
    )
    SELECT doc_id, source FROM thr
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < t
       OR source = 'src0'
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing via deterministic content-hash sampling: keep src0
    fully, src1 at 50%, src2 at 25%, everything else at 10% — the same
    document makes the same keep/drop decision on any engine, cluster
    size, or re-run (md5 keying, not seed-and-partition-dependent
    `sample()`). Pure filter, no shuffle; oracle replays the identical
    md5-prefix rule in DuckDB."""
    docs = load_table(spark, "documents", sf_dir)
    out = S.hash_sample_stratified(
        docs, "doc_id", "source", _MIX_RATES, default_rate=_MIX_DEFAULT
    )
    return out.select("doc_id", "source")


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------
@query(
    "q_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    )
    SELECT t.doc_id, t.term,
           CAST(t.tf AS BIGINT) AS tf,
           CAST(f.df AS BIGINT) AS df,
           CAST(d.dl AS BIGINT) AS dl,
           round(
             ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
             * (t.tf * (1.2 + 1)) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)),
             6
           ) AS bm25
    FROM tf t
    JOIN dl d USING (doc_id)
    JOIN dfreq f USING (term)
    CROSS JOIN consts c
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) per (doc, term) — the retrieval
    scoring layer over the TF-IDF inverted index, used for quality
    filtering ('docs similar to a trusted seed set') and RAG indexing.
    bm25 rounds to 6dp on both sides (ln is libm); tf/df/dl and the
    avgdl scalar are exact integers/means cross-engine."""
    docs = load_table(spark, "documents", sf_dir)
    out = TX.bm25_scores(docs, k1=1.2, b=0.75)
    return out.withColumn("bm25", F.round("bm25", 6))


# --------------------------------------------------------------------------
# Mergeable histogram-quantile rollup
# --------------------------------------------------------------------------
_H_LO, _H_HI, _H_BINS = 0.0, 512000.0, 64
_H_WIDTH = (_H_HI - _H_LO) / _H_BINS

@query(
    "q_histogram_quantile",
    oracle=f"""
    WITH hist AS (
      SELECT o_orderpriority,
             CAST(least({_H_BINS - 1}, greatest(0,
                  floor((o_totalprice - {_H_LO!r}) / {_H_WIDTH!r}))) AS INT) AS bin,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), cum AS (
      SELECT o_orderpriority, bin,
             sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY o_orderpriority) AS total
      FROM hist
    )
    SELECT o_orderpriority,
           {_H_LO!r} + (min(CASE WHEN cum / CAST(total AS DOUBLE) >= 0.5
                            THEN bin END) + 1) * {_H_WIDTH!r} AS p50,
           {_H_LO!r} + (min(CASE WHEN cum / CAST(total AS DOUBLE) >= 0.95
                            THEN bin END) + 1) * {_H_WIDTH!r} AS p95
    FROM cum GROUP BY 1
    """,
)
def q_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority p50/p95 of order value from a 64-bin histogram
    sketch — the mergeable quantile shape (constant-size partial state,
    map-side combine, rollup-able) that replaces exact `percentile` at
    100 TB. Deterministic integer counts → bit-exact cross-engine,
    unlike approx_percentile's engine-private GK sketch."""
    orders = load_table(spark, "orders", sf_dir)
    return AGG.histogram_quantiles(
        orders, "o_orderpriority", "o_totalprice",
        lo=_H_LO, hi=_H_HI, nbins=_H_BINS, ps=(0.5, 0.95),
    )


# --------------------------------------------------------------------------
# Incremental (cross-corpus) near-dedup
# --------------------------------------------------------------------------
@query(
    "q_cross_dedup",
    headline=True,
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n_sh FROM sh
    ), pairs AS (
      SELECT a.doc_id AS new_id, count(*) AS shared,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
      FROM e a JOIN e b ON a.s = b.s
      WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
      GROUP BY a.doc_id, b.doc_id
    ), dup AS (
      SELECT DISTINCT new_id FROM pairs
      WHERE shared / (n_a + n_b - shared) >= 0.5
    )
    SELECT d.doc_id, dup.new_id IS NOT NULL AS is_dup
    FROM documents d LEFT JOIN dup ON d.doc_id = dup.new_id
    WHERE d.doc_id % 3 = 0
    """,
)
def q_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: treat doc_id % 3 == 0 as the NEW crawl
    batch and the rest as the accumulated corpus; flag every new doc
    that is a near-duplicate (3-gram Jaccard >= 0.5) of ANY kept doc.
    The new batch's prefix index broadcasts — the corpus never shuffles
    for candidate generation. This is the recurring shape of production
    crawl ingestion (dedup each snapshot against everything kept so
    far), distinct from the one-shot self-join dedup."""
    from .operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    # shingle the SHARED scan once and slice it for both sides (the
    # new_shingles/ref_shingles fast path): previously each side ran its
    # own scan + tokenize/shingle/hash + checkpoint over the same table
    sh_all = D.materialize_df(
        D.shingle_table(docs, "doc_id", n=3), "localCheckpoint"
    )
    return D.cross_corpus_near_dup_flags(
        new,
        None,
        "doc_id",
        n=3,
        threshold=0.5,
        new_shingles=sh_all.filter(F.col("doc") % 3 == 0),
        ref_shingles=sh_all.filter(F.col("doc") % 3 != 0),
    )


# --------------------------------------------------------------------------
# Substring-level dedup rewrite (duplicate-span removal)
# --------------------------------------------------------------------------
@query(
    "q_dedup_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w FROM toks
    ), spans AS (
      SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS s FROM pos
    ), stats AS (
      SELECT s, count(DISTINCT doc_id) AS span_df, min(doc_id) AS mindoc
      FROM spans GROUP BY s
    ), starts AS (
      SELECT sp.doc_id, sp.i FROM spans sp JOIN stats USING (s)
      WHERE stats.span_df > 1 AND stats.mindoc <> sp.doc_id
    ), cov AS (
      SELECT doc_id, list(DISTINCT j) AS cov FROM (
        SELECT DISTINCT doc_id, unnest(range(i, i + 3)) AS j FROM starts
      ) GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(array_to_string(
             [t.w[j] for j in range(1, len(t.w) + 1)
              if NOT coalesce(list_contains(c.cov, j), false)], ' '
           ), '') AS text_clean,
           CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN cov c USING (doc_id)
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup rewrite (Lee et al.-style): strip every
    3-gram span that occurs in more than one document, keeping the copy
    in the span's minimum doc_id; emit the rewritten text and how many
    tokens were dropped. The complement of the q_dup_span_coverage
    METRIC — this is the actual corpus TRANSFORM a substring-dedup job
    ships. One inverted-index shuffle + a bounded explode + per-row
    array rebuild; no document pair is ever compared."""
    from .operators import text as TXX

    docs = load_table(spark, "documents", sf_dir)
    return TXX.remove_duplicate_spans(docs, n=3)


# --------------------------------------------------------------------------
# Fixed-budget per-stratum sampling
# --------------------------------------------------------------------------
@query(
    "q_group_sample",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-5-docs-per-source deterministic sample (fixed-budget
    domain mixing / eval-set carving): rank by md5(doc_id) within each
    source, keep the 5 smallest — stable across engines, layouts, and
    reruns, unlike seed-based sampling. Spark plans the rank filter as
    WindowGroupLimit (per-partition top-k heaps, not full sorts)."""
    from .operators.sampling import hash_sample_fixed_k

    docs = load_table(spark, "documents", sf_dir)
    return hash_sample_fixed_k(docs, "doc_id", "source", k=5).select(
        "doc_id", "source"
    )


# --------------------------------------------------------------------------
# Distributed embedding centroids
# --------------------------------------------------------------------------
@query(
    "q_label_centroids",
    oracle="""
    SELECT label,
           CAST(dim AS INT) AS dim,
           round(avg(CAST(v AS DOUBLE)), 6) AS centroid,
           count(*) AS n_vecs
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of every embedding dimension — the distributed
    aggregation step of k-means / IVF training / SemDeDup cluster
    pruning. Map-side partial sums make the shuffle |labels| x dim
    rows regardless of corpus size. avg over floats is order-dependent
    → rounded to 6dp on both sides."""
    from .operators import similarity as SIM

    emb = load_table(spark, "embeddings", sf_dir)
    out = SIM.label_centroids(emb)
    return out.withColumn("centroid", F.round("centroid", 6))


# --------------------------------------------------------------------------
# k-means iteration: M-step centroids + E-step assignment
# --------------------------------------------------------------------------
@query(
    "q_kmeans_assign",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), pos AS (
      SELECT label, unnest(ve) AS x, generate_subscripts(ve, 1) AS dim FROM v
    ), cent AS (
      SELECT label, list(round(c, 6) ORDER BY dim) AS cvec FROM (
        SELECT label, dim, avg(x) AS c FROM pos GROUP BY label, dim
      ) GROUP BY label
    ), sims AS (
      SELECT v.vec_id, c.label,
             round(list_cosine_similarity(v.ve, c.cvec), 6) AS sim
      FROM v CROSS JOIN cent c
    )
    SELECT vec_id, label AS assigned_label, sim FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, label) AS rn
      FROM sims
    ) WHERE rn = 1
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full distributed k-means iteration over the embedding corpus:
    M-step = label_centroids (map-side-combined aggregate, shuffle is
    |labels| x dim), E-step = assign_to_centroids (broadcast nested loop,
    zero data shuffle, windowed argmax). Centroids round to 6dp before
    the distance so both engines rank identical inputs; similarity
    rounds before ranking with label tie-break (engine-deterministic
    choice at exact ties)."""
    from .operators import similarity as SIM

    emb = load_table(spark, "embeddings", sf_dir)
    cents = SIM.label_centroids(emb).withColumn(
        "centroid", F.round("centroid", 6)
    )
    return SIM.assign_to_centroids(emb, cents)


# --------------------------------------------------------------------------
# Full curation pipeline composite
# --------------------------------------------------------------------------
@query(
    "q_curate_end2end",
    headline=True,
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+4], ' ')
                            for i in range(1, len(w) - 3)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0
    ), contaminated AS (
      SELECT DISTINCT e.doc_id
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 <> 0) e
      JOIN bench USING (s)
    ), survivors AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS w FROM documents d
      WHERE d.doc_id % 97 <> 0
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w FROM survivors
    ), spans AS (
      SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS s FROM pos
    ), stats AS (
      SELECT s, count(DISTINCT doc_id) AS span_df, min(doc_id) AS mindoc
      FROM spans GROUP BY s
    ), starts AS (
      SELECT sp.doc_id, sp.i FROM spans sp JOIN stats USING (s)
      WHERE stats.span_df > 1 AND stats.mindoc <> sp.doc_id
    ), cov AS (
      SELECT doc_id, list(DISTINCT j) AS cov FROM (
        SELECT DISTINCT doc_id, unnest(range(i, i + 3)) AS j FROM starts
      ) GROUP BY doc_id
    ), cleaned AS (
      SELECT t.doc_id,
             coalesce(array_to_string(
               [t.w[j] for j in range(1, len(t.w) + 1)
                if NOT coalesce(list_contains(c.cov, j), false)], ' '
             ), '') AS text_clean
      FROM survivors t LEFT JOIN cov c USING (doc_id)
    ), scored AS (
      SELECT doc_id, text_clean,
             least(len(string_split(text_clean, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text_clean, ' ')))
                  / len(string_split(text_clean, ' '))) AS q_score
      FROM cleaned
    )
    SELECT doc_id, text_clean, q_score FROM scored
    WHERE q_score >= 0.1
      AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
    """,
)
def q_curate_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pipeline a pretraining-data job runs, as one
    composed plan: 5-gram benchmark decontamination (drop any doc
    sharing an n-gram with the eval slice) → duplicate-span removal over
    the survivors (canonical copy kept) → quality re-score of the
    REWRITTEN text → deterministic 50% hash sample. Every stage is the
    already-oracle-checked operator; the composite is hash-checked end
    to end by one chained-CTE oracle — integration bugs between stages
    (wrong stage order, stats computed over the wrong population) would
    break the hash even though each piece passes alone. Scale shape:
    one broadcast match + two inverted-index shuffles + projections."""
    from .operators.dedup import shingles as _  # noqa: F401 (parity with oracle)

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    flags = TX.benchmark_ngram_overlap(corpus, bench, n=5)
    survivors = corpus.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    cleaned = TX.remove_duplicate_spans(survivors, n=3).select(
        "doc_id", "text_clean"
    )
    scored = TX.quality_score(
        cleaned.withColumnRenamed("text_clean", "text")
    ).select("doc_id", F.col("text").alias("text_clean"), "q_score")
    kept = S.hash_sample(scored.filter(F.col("q_score") >= 0.1), "doc_id", 0.5)
    return kept.select("doc_id", "text_clean", "q_score")


# --------------------------------------------------------------------------
# Corpus mix report
# --------------------------------------------------------------------------
@query(
    "q_corpus_mix",
    oracle="""
    WITH g AS (
      SELECT source, lang,
             count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM g)
    SELECT g.source, g.lang, g.n_docs, g.n_tokens,
           g.n_tokens / CAST(t.total_tokens AS DOUBLE) AS token_share
    FROM g CROSS JOIN tot t
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mix report every pretraining run is planned around:
    docs/tokens per (source, lang) with each cell's share of total
    tokens. The total ships as a broadcast 1-row aggregate, NOT an
    unpartitioned window (a global window funnels every row through one
    partition at 100 TB; the broadcast keeps the plan two shuffle-free
    joins after one groupBy). Integer token sums are exact, the share
    division is per-row IEEE — no rounding needed."""
    from .operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    tot = g.agg(F.sum("n_tokens").alias("total_tokens"))
    return g.crossJoin(F.broadcast(tot)).select(
        "source", "lang", "n_docs", "n_tokens",
        (F.col("n_tokens") / F.col("total_tokens").cast("double")).alias("token_share"),
    )


# --------------------------------------------------------------------------
# Composite quality gate
# --------------------------------------------------------------------------
@query(
    "q_quality_gate",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) < 20 AS fail_short,
           (1.0 - len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) > 0.4 AS fail_repetitive,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['the', 'a', 'and', 'of'])) = 0 AS fail_nonenglish,
           (regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')
            OR regexp_matches(text, '[0-9]{3}-[0-9]{4}')
            OR regexp_matches(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS fail_pii,
           NOT (len(string_split(text, ' ')) < 20
                OR (1.0 - len(list_distinct(string_split(text, ' ')))
                          / len(string_split(text, ' '))) > 0.4
                OR len(list_intersect(list_distinct(string_split(text, ' ')),
                                      ['the', 'a', 'and', 'of'])) = 0
                OR regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')
                OR regexp_matches(text, '[0-9]{3}-[0-9]{4}')
                OR regexp_matches(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS keep_doc
    FROM documents
    """,
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate: per-rule fail flags (short /
    repetitive / non-English / PII) plus the combined keep verdict for
    every document — the auditable form of a crawl quality filter (rule
    firing rates by source are one groupBy away). Single projection,
    zero shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    return TX.quality_gate(docs)


# --------------------------------------------------------------------------
# Dedup audit: cluster-size distribution
# --------------------------------------------------------------------------
@query(
    "q_dedup_audit",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n_sh FROM sh
    ), pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
               any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      WHERE shared / (n_a + n_b - shared) >= 0.5
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src
    ), roots AS (
      SELECT id, min(r) AS cluster_root FROM reach GROUP BY id
    ), sizes AS (
      SELECT cluster_root, count(*) AS cluster_size FROM roots GROUP BY 1
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(cluster_size - 1) AS BIGINT) AS docs_dropped
    FROM sizes GROUP BY 1
    """,
)
def q_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup AUDIT report: the near-dup cluster-size distribution and how
    many documents each size class drops — the numbers a data team reads
    before signing off a dedup run ('how much of the corpus is
    duplicated, in what clump sizes?'). Composes the prefix-Jaccard
    candidate join and pointer-jumping connected components, then two
    tiny aggregations; oracle replays the whole chain with a recursive
    CTE. Only docs appearing in some qualifying pair are clustered
    (singletons are implicitly size-1 and drop nothing)."""
    from .operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
    clusters = D.connected_components(pairs)
    sizes = clusters.groupBy("cluster_root").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("cluster_size") - 1).alias("docs_dropped"),
    )


# --------------------------------------------------------------------------
# Sketch-based winsorization (outlier clipping)
# --------------------------------------------------------------------------
@query(
    "q_winsorize",
    oracle=f"""
    WITH hist AS (
      SELECT o_orderpriority,
             CAST(least({_H_BINS - 1}, greatest(0,
                  floor((o_totalprice - {_H_LO!r}) / {_H_WIDTH!r}))) AS INT) AS bin,
             count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), cum AS (
      SELECT o_orderpriority, bin,
             sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY o_orderpriority) AS total
      FROM hist
    ), caps AS (
      SELECT o_orderpriority,
             {_H_LO!r} + (min(CASE WHEN cum / CAST(total AS DOUBLE) >= 0.95
                              THEN bin END) + 1) * {_H_WIDTH!r} AS cap
      FROM cum GROUP BY 1
    )
    SELECT o.o_orderkey,
           o.o_orderpriority,
           least(o.o_totalprice, c.cap) AS totalprice_clipped,
           o.o_totalprice > c.cap AS was_clipped
    FROM orders o JOIN caps c USING (o_orderpriority)
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based winsorization: clip each order's value at its
    priority group's p95 (from the mergeable histogram sketch) and flag
    clipped rows — the outlier-capping step reward/score pipelines run
    before aggregation so one pathological value can't dominate a mean.
    The per-group cap table is tiny → broadcast join; the clip itself is
    a projection. Fully deterministic (integer-count sketch + least),
    oracle-exact."""
    orders = load_table(spark, "orders", sf_dir)
    caps = AGG.histogram_quantiles(
        orders, "o_orderpriority", "o_totalprice",
        lo=_H_LO, hi=_H_HI, nbins=_H_BINS, ps=(0.95,),
    ).withColumnRenamed("p95", "cap")
    return (
        orders.join(F.broadcast(caps), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.least(F.col("o_totalprice"), F.col("cap")).alias("totalprice_clipped"),
            (F.col("o_totalprice") > F.col("cap")).alias("was_clipped"),
        )
    )


# --------------------------------------------------------------------------
# Curriculum binning
# --------------------------------------------------------------------------
@query(
    "q_curriculum",
    oracle="""
    WITH q AS (
      SELECT doc_id, source,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
    )
    SELECT doc_id, source, q_score,
           ntile(4) OVER (PARTITION BY source
                          ORDER BY q_score DESC, doc_id) AS curriculum_bin
    FROM q
    """,
)
def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: quality quartiles within each source (bin 1 =
    highest quality) — the assignment a quality-ordered data curriculum
    or an annealed mix schedule trains from. ntile ties are broken by
    doc_id so the assignment is engine-deterministic; one window shuffle
    per source partition, parallel across sources."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "q_score"
    )
    w = Window.partitionBy("source").orderBy(F.col("q_score").desc(), F.col("doc_id"))
    return scored.withColumn("curriculum_bin", F.ntile(4).over(w))


# --------------------------------------------------------------------------
# BM25 search (retrieval top-k)
# --------------------------------------------------------------------------
_SEARCH_TERMS = ("data", "model", "learning")

@query(
    "q_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), scored AS (
      SELECT t.doc_id,
             round(sum(
               ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * (1.2 + 1))
               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl))
             ), 6) AS score
      FROM tf t
      JOIN dl d USING (doc_id)
      JOIN dfreq f USING (term)
      CROSS JOIN consts c
      WHERE t.term IN {_SEARCH_TERMS!r}
      GROUP BY t.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-10 documents for a fixed 3-term query — what
    the BM25 index exists FOR (seed-set expansion, RAG retrieval,
    quality filtering by similarity to trusted docs). The term filter
    pushes into the inverted index before any join, so only matching
    postings flow; per-doc sums round to 6dp BEFORE the top-k with a
    doc_id tie-break (engine-deterministic selection). Sum order within
    a doc: <= 3 addends, summed in DuckDB's and Spark's group order —
    both tiny and, with 6dp rounding, stable in practice at every
    tested scale."""
    docs = load_table(spark, "documents", sf_dir)
    scores = TX.bm25_scores(docs, k1=1.2, b=0.75)
    out = (
        scores.filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )
    return out


# --------------------------------------------------------------------------
# Cross-source duplication matrix
# --------------------------------------------------------------------------
@query(
    "q_dedup_source_matrix",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n_sh FROM sh
    ), pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
               any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      WHERE shared / (n_a + n_b - shared) >= 0.5
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs
    FROM pairs p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pair counts by
    (source, source) — the audit that shows WHICH sources mirror each
    other (within-source boilerplate vs cross-source scraping), i.e.
    where a source-level dedup policy should bite. Prefix-Jaccard pairs
    joined twice against the doc→source dimension (broadcast-able),
    sources ordered within each pair so the matrix is upper-triangular
    regardless of id order."""
    from .operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.ngram_jaccard_pairs_prefix(docs, "doc_id", n=3, threshold=0.5)
    dim = docs.select("doc_id", "source")
    joined = (
        pairs.join(
            F.broadcast(dim).withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("source", "src_a"), "doc_a",
        )
        .join(
            F.broadcast(dim).withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("source", "src_b"), "doc_b",
        )
    )
    return joined.groupBy(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# --------------------------------------------------------------------------
# Distributed k-means fit (iterative — rows-only per driver contract)
# --------------------------------------------------------------------------
@query("q_kmeans_fit", oracle=None)
def q_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed spherical k-means (k=8, 3 Lloyd rounds) over the
    embedding corpus; output = per-cluster size and mean assigned
    similarity. Iterative float evolution is not SQL-expressible, so
    this is a rows-only entry (the driver records rows; the convergence
    property — the k-means objective improves across rounds — is
    asserted in tests)."""
    from .operators import similarity as SIM

    emb = load_table(spark, "embeddings", sf_dir)
    assigned, _ = SIM.kmeans_fit_distributed(emb, k=8, iters=3)
    return assigned.groupBy("assigned_label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("sim"), 4).alias("mean_sim"),
    )


# --------------------------------------------------------------------------
# Per-source exact-duplication rate
# --------------------------------------------------------------------------
@query(
    "q_dup_rate",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE) AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def q_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication rate (1 - unique/total content
    hashes) — the one-line health metric that decides whether a source
    needs dedup at all. One groupBy with a distinct-count; at 100 TB
    the same number comes from the mergeable HLL sketch_rollup when an
    approximation suffices."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
        (
            F.lit(1.0)
            - F.count_distinct(F.md5(F.col("text").cast("binary")))
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


# --------------------------------------------------------------------------
# SemDeDup: cluster-bounded semantic near-dup pruning (sqrt-N clusters)
# --------------------------------------------------------------------------
def _semdedup_sqrtk_oracle(fit_iters: int = 2, threshold: float = 0.35) -> str:
    """Unroll the sqrt(N)-k-means fit + cluster-bounded pair join in
    SQL. k is computed IN the oracle (ceil(sqrt(count))) so one string
    certifies every scale — the same fit replay as _kmeans_cert_oracle
    (md5-rank seeds, round-before-rank assignments, 6dp-rounded
    M-steps). The Spark side reuses the fit's FINAL E-step as the
    cluster assignment (semantic_dedup_flags(assignment=...) — no extra
    N x k pass), so the oracle's last CTE level is a{fit_iters-1}
    against c{fit_iters-1}. Every CTE is MATERIALIZED: the final
    assignment is referenced three times (pair-join both sides + output
    spine) and DuckDB would otherwise re-inline the whole iterative
    subtree per reference."""
    ctes = [f"""v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), c0 AS MATERIALIZED (
      SELECT CAST(rn - 1 AS INT) AS label, list_transform(ve, x -> round(x, 6)) AS cvec
      FROM (
        SELECT vec_id, ve,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM v
      ) WHERE rn <= (SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM v)
    )"""]
    for i in range(fit_iters):
        ctes.append(f"""a{i} AS MATERIALIZED (
      SELECT vec_id, ve, label, sim FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, label) AS rn
        FROM (
          SELECT v.vec_id, v.ve, c.label,
                 round(list_cosine_similarity(v.ve, c.cvec), 6) AS sim
          FROM v CROSS JOIN c{i} c
        ) s
      ) WHERE rn = 1
    )""")
        if i < fit_iters - 1:
            ctes.append(f"""c{i + 1} AS MATERIALIZED (
      SELECT label, list(round(c, 6) ORDER BY dim) AS cvec FROM (
        SELECT label, dim, avg(x) AS c FROM (
          SELECT label, unnest(ve) AS x, generate_subscripts(ve, 1) AS dim
          FROM a{i}
        ) GROUP BY label, dim
      ) GROUP BY label
    )""")
    last = f"a{fit_iters - 1}"
    ctes.append(f"""dups AS MATERIALIZED (
      SELECT DISTINCT a.vec_id FROM {last} a JOIN {last} b
        ON a.label = b.label AND a.vec_id > b.vec_id
       AND round(list_cosine_similarity(a.ve, b.ve), 6) >= {threshold}
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT g.vec_id, g.label AS sem_cluster,
           (d.vec_id IS NOT NULL) AS is_semdup
    FROM {last} g LEFT JOIN dups d ON g.vec_id = d.vec_id"""
    )


@query(
    "q_semdedup",
    headline=True,
    oracle=_semdedup_sqrtk_oracle(),
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) with the paper's k ~ sqrt(N)
    re-clustering: fit k = ceil(sqrt(N)) spherical-k-means centroids on
    the corpus itself (kmeans_fit_distributed, round_dp=6 so the
    unrolled-CTE oracle replays the fit bit-for-bit), assign every
    embedding to its nearest centroid (broadcast E-step), then flag
    items whose cosine to a lower-id member of the SAME cluster is
    >= 0.35 — min-id canonical survives.

    sqrt(N) is the scale fix the round-3 probe demanded: with k frozen,
    mean cluster size grows ~N and the cluster-bounded pair join goes
    quadratic (measured 2.0s -> 18.3s at 10x, SCALE_PROBE.json r3);
    with k ~ sqrt(N), E[|cluster|] ~ sqrt(N) so candidate pairs grow
    ~N*sqrt(N) instead of N² and each cluster stays partition-sized —
    candidate pairs drop ~11x at 30x corpus (SCALE_PROBE.json
    sem_*_pairs). The cluster key is the fit's FINAL E-step, reused
    directly (assignment=) rather than re-assigned — one fewer N x k
    pass. The k-sizing count is one cheap driver action on corpus
    METADATA (a count, not data rows); the fit itself is fully
    distributed."""
    import math

    from .operators import similarity as SIM

    emb = load_table(spark, "embeddings", sf_dir)
    k = int(math.ceil(math.sqrt(emb.count())))
    assigned, _ = SIM.kmeans_fit_distributed(emb, k=k, iters=2, round_dp=6)
    return SIM.semantic_dedup_flags(emb, None, threshold=0.35, assignment=assigned)


# --------------------------------------------------------------------------
# Clean eval-set carving
# --------------------------------------------------------------------------
@query(
    "q_eval_carve",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+4], ' ')
                            for i in range(1, len(w) - 3)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0
    ), contaminated AS (
      SELECT DISTINCT e.doc_id
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 <> 0) e
      JOIN bench USING (s)
    ), clean AS (
      SELECT d.doc_id, d.source FROM documents d
      WHERE d.doc_id % 97 <> 0
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'eval'), doc_id
             ) AS rn
      FROM clean
    ) WHERE rn <= 3
    """,
)
def q_eval_carve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out eval-set carving, the composite every training run needs
    before it starts: drop documents sharing any 5-gram with the
    benchmark slice (contamination would leak eval answers into the
    carve), then take EXACTLY 3 docs per source by salted-md5 rank —
    deterministic across engines, layouts, and reruns, so the eval set
    is reproducible from the corpus alone. Decontamination broadcasts
    the benchmark shingle set; the carve is one WindowGroupLimit shuffle
    on the source key."""
    from .operators.sampling import hash_sample_fixed_k
    from .operators.text import benchmark_ngram_overlap

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    flags = benchmark_ngram_overlap(corpus, bench, n=5).select("doc_id", "contaminated")
    clean = (
        corpus.join(flags, ["doc_id"])
        .filter(~F.col("contaminated"))
        .select("doc_id", "source")
    )
    return hash_sample_fixed_k(clean, "doc_id", "source", k=3, salt="eval").select(
        "doc_id", "source"
    )


@query(
    "q_decontaminate_spans",
    oracle="""
    WITH bsh AS (
      SELECT DISTINCT unnest(
        list_distinct([array_to_string(w[i:i+4], ' ')
                       for i in range(1, len(w) - 3)])) AS s
      FROM (SELECT string_split(text, ' ') AS w FROM documents
            WHERE doc_id % 97 = 0)
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 97 <> 0
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(w) - 3)) AS i, w FROM toks
    ), spans AS (
      SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS s FROM pos
    ), starts AS (
      SELECT sp.doc_id, sp.i FROM spans sp JOIN bsh USING (s)
    ), cov AS (
      SELECT doc_id, list(DISTINCT j) AS cov FROM (
        SELECT DISTINCT doc_id, unnest(range(i, i + 5)) AS j FROM starts
      ) GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(array_to_string(
             [t.w[j] for j in range(1, len(t.w) + 1)
              if NOT coalesce(list_contains(c.cov, j), false)], ' '
           ), '') AS text_clean,
           CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN cov c USING (doc_id)
    """,
)
def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: strip the tokens covered by any
    5-gram shared with the benchmark slice instead of dropping the whole
    document — the document-level q_decontaminate policy discards an
    entire page for one quoted sentence; this keeps the clean remainder
    (and removes nothing from untouched docs). Benchmark shingles
    broadcast; the corpus never shuffles except the per-doc covered-set
    aggregation. Emits the rewritten text for every corpus doc."""
    from .operators.text import remove_contaminated_spans

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return remove_contaminated_spans(corpus, bench, n=5)


def _cross_minhash_oracle(num_hashes: int = 8, bands: int = 4) -> str:
    """Replay the incremental MinHash-LSH dedup: salted md5-string
    minima, band concatenation, new x ref band-collision candidates,
    exact string-shingle Jaccard verification."""
    r = num_hashes // bands
    mins = ",\n             ".join(
        f"min(md5('{i}:' || s)) AS m{i}" for i in range(num_hashes)
    )
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {j} AS band_id, {bv} AS bv FROM m".format(
            j=j, bv=" || '|' || ".join(f"m{j * r + i}" for i in range(r))
        )
        for j in range(bands)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), m AS (
      SELECT doc_id,
             {mins}
      FROM e GROUP BY doc_id
    ), b AS (
      {band_rows}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_new, c.doc_id AS doc_ref
      FROM b a JOIN b c ON a.band_id = c.band_id AND a.bv = c.bv
      WHERE a.doc_id % 3 = 0 AND c.doc_id % 3 <> 0
    ), dup AS (
      SELECT DISTINCT cand.doc_new FROM cand
      JOIN sh sa ON sa.doc_id = cand.doc_new
      JOIN sh sb ON sb.doc_id = cand.doc_ref
      WHERE len(list_intersect(sa.shingles, sb.shingles))
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
    )
    SELECT d.doc_id, dup.doc_new IS NOT NULL AS is_dup
    FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_new
    WHERE d.doc_id % 3 = 0
    """


@query("q_cross_dedup_lsh", oracle=_cross_minhash_oracle())
def q_cross_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup with a MinHash-LSH candidate index — the
    approximate sibling of q_cross_dedup: the corpus side's band table
    (minhash_bands_md5, persisted once per snapshot in production) is
    probed by the new batch's broadcast band table for candidates, then
    exact 3-gram Jaccard >= 0.5 verifies against the corpus shingle
    table. Candidate generation touches |docs| x 4 index rows instead of
    per-shingle prefixes — the cheap-to-maintain index variant, with
    the md5-string family keeping the whole path oracle-replayable."""
    from .operators import dedup as D

    docs = load_table(spark, "documents", sf_dir)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    ref = docs.filter(F.col("doc_id") % 3 != 0)
    return D.cross_corpus_minhash_flags(new, ref, "doc_id", n=3, threshold=0.5)


# --------------------------------------------------------------------------
# Quality-weighted downsampling
# --------------------------------------------------------------------------
_QMIX_RATES = {1: 1.0, 2: 0.5, 3: 0.25, 4: 0.1}

@query(
    "q_quality_mix",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
    ), binned AS (
      SELECT doc_id, source,
             ntile(4) OVER (PARTITION BY source
                            ORDER BY q_score DESC, doc_id) AS curriculum_bin
      FROM q
    )
    SELECT doc_id, source, curriculum_bin FROM binned
    WHERE curriculum_bin = 1
       OR substr(md5(CAST(doc_id AS VARCHAR) || 'qmix'), 1, 8) <
          CASE curriculum_bin
            WHEN 2 THEN '{S._md5_threshold(0.5)}'
            WHEN 3 THEN '{S._md5_threshold(0.25)}'
            ELSE '{S._md5_threshold(0.1)}'
          END
    """,
)
def q_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling — the quality-aware mixing step a
    pretraining corpus runs after scoring (keep the best quartile fully,
    thin lower quartiles at 50%/25%/10%): per-source quality quartiles
    (ntile, doc_id tie-break) gate a deterministic md5-threshold
    Bernoulli per bin. Every decision is reproducible from the corpus
    alone — same doc, same verdict on any engine, layout, or rerun; the
    whole policy is one window + one projection filter."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "q_score"
    )
    w = Window.partitionBy("source").orderBy(F.col("q_score").desc(), F.col("doc_id"))
    binned = scored.withColumn("curriculum_bin", F.ntile(4).over(w))
    digest8 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("qmix"))), 1, 8
    )
    thr = F.when(F.col("curriculum_bin") == 2, F.lit(S._md5_threshold(0.5))).when(
        F.col("curriculum_bin") == 3, F.lit(S._md5_threshold(0.25))
    ).otherwise(F.lit(S._md5_threshold(0.1)))
    return binned.filter(
        (F.col("curriculum_bin") == 1) | (digest8 < thr)
    ).select("doc_id", "source", "curriculum_bin")


# --------------------------------------------------------------------------
# Temperature-based language rebalancing (mT5/XLM-R alpha-sampling)
# --------------------------------------------------------------------------
@query(
    "q_temperature_mix",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
    ), w AS (
      SELECT lang, CAST(sum(n_tok) AS DOUBLE) AS w FROM tok GROUP BY 1
    ), r AS (
      SELECT lang, round(pow((SELECT min(w) FROM w) / w, 0.7), 6) AS keep_rate
      FROM w
    ), t AS (
      SELECT lang, keep_rate,
             CASE WHEN keep_rate >= 1.0 THEN 'g'
                  ELSE lower(lpad(hex(CAST(floor(keep_rate * 4294967296.0)
                                           AS BIGINT)), 8, '0'))
             END AS thr
      FROM r
    )
    SELECT d.doc_id, d.lang, t.keep_rate
    FROM tok d JOIN t USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 8) < t.thr
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature rebalancing over languages (alpha=0.3, the mT5
    default): head languages are thinned toward the tail at rate
    (w_min/w_lang)^0.7 by token weight, the rarest language keeps every
    document. The rates are computed FROM the corpus inside the plan (one
    |langs|-row aggregate broadcast back) and converted to md5 thresholds
    in-engine — the whole policy is reproducible from the data alone and
    the corpus itself never shuffles."""
    docs = load_table(spark, "documents", sf_dir)
    kept = S.temperature_rebalance(
        docs.select("doc_id", "lang", "text"),
        key_col="doc_id",
        strata_col="lang",
        weight_col=TX.token_count(F.col("text")),
        alpha=0.3,
        salt="temp",
    )
    return kept.select("doc_id", "lang", "keep_rate")


# --------------------------------------------------------------------------
# DSIR-style importance selection
# --------------------------------------------------------------------------
@query(
    "q_dsir_score",
    oracle="""
    WITH rt AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 7 <> 0
    ), tt AS (
      SELECT unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id % 7 = 0
    ), rc AS (
      SELECT term, count(*) AS rn FROM rt GROUP BY 1
    ), tc AS (
      SELECT term, count(*) AS tn FROM tt GROUP BY 1
    ), v AS (
      SELECT term FROM rc UNION SELECT term FROM tc
    ), lm AS (
      SELECT v.term, coalesce(rn, 0) AS rn, coalesce(tn, 0) AS tn
      FROM v LEFT JOIN rc USING (term) LEFT JOIN tc USING (term)
    ), c AS (
      SELECT CAST(sum(rn) AS DOUBLE) AS nr, CAST(sum(tn) AS DOUBLE) AS nt,
             CAST(count(*) AS DOUBLE) AS vsz
      FROM lm
    ), lr AS (
      SELECT term,
             round(ln((tn + 1.0) / (nt + vsz)) - ln((rn + 1.0) / (nr + vsz)),
                   12) AS lr
      FROM lm CROSS JOIN c
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(lr), 4) AS dsir_score
    FROM rt JOIN lr USING (term)
    GROUP BY 1
    """,
)
def q_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores for the whole raw slice (doc_id % 7 != 0)
    against a small trusted target slice (doc_id % 7 == 0): per-doc
    sum of add-1-smoothed unigram log-likelihood ratios. The downstream
    selection (keep the most target-like docs) is a deterministic sort
    on (dsir_score, doc_id) — emitted unfiltered here so the oracle pins
    every score, not just the survivors."""
    docs = load_table(spark, "documents", sf_dir)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    target = docs.filter(F.col("doc_id") % 7 == 0)
    return TX.dsir_logratio(raw, target)


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense, reciprocal-rank fusion
# --------------------------------------------------------------------------
@query(
    "q_hybrid_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), bm AS (
      SELECT t.doc_id,
             round(sum(
               ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * (1.2 + 1))
               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl))
             ), 6) AS score
      FROM tf t
      JOIN dl d USING (doc_id)
      JOIN dfreq f USING (term)
      CROSS JOIN consts c
      WHERE t.term IN {_SEARCH_TERMS!r}
      GROUP BY t.doc_id
    ), bmr AS (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM bm
      ) WHERE r <= 10
    ), q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), dn AS (
      SELECT vec_id AS doc_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                          (SELECT qv FROM q)), 6) AS cs
      FROM embeddings
    ), dnr AS (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS r
        FROM dn
      ) WHERE r <= 10
    )
    SELECT doc_id, rank_bm25, rank_dense, rrf_score FROM (
      SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
             CAST(b.r AS BIGINT) AS rank_bm25,
             CAST(d.r AS BIGINT) AS rank_dense,
             round(coalesce(1.0 / (60 + b.r), 0.0)
                   + coalesce(1.0 / (60 + d.r), 0.0), 6) AS rrf_score
      FROM bmr b FULL OUTER JOIN dnr d ON b.doc_id = d.doc_id
    )
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """,
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 (lexical, 3-term query) fused with
    exact dense cosine top-10 (query = embedding of vec 0, vec_id keyed
    to doc_id) via reciprocal-rank fusion — the production RAG/seed-set
    retrieval shape where neither scorer's scale is trusted, only its
    ranks. Both retrievers round before ranking (engine-deterministic
    lists), fusion joins two 10-row lists (trivially broadcast), and the
    fused top-10 ties break by doc_id."""
    from pyspark.sql import Window

    from .operators import similarity as SIM
    from .queries_llm import _query_vector

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    bm = (
        TX.bm25_scores(docs, k1=1.2, b=0.75)
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25"), 6).alias("score"))
    )
    # top-10 FIRST (TakeOrderedAndProject: distributed per-partition heaps,
    # no global sort), THEN rank the 10 survivors — the global row_number
    # window only ever sees 10 rows, not the whole scored corpus.
    # dim-sized window: 10 rows post-limit.
    w_bm = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    bmr = (
        bm.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
        .withColumn("rank", F.row_number().over(w_bm))
        .select("doc_id", "rank")
    )

    qv = _query_vector(spark, sf_dir)
    dnr = (
        SIM.cosine_topk(emb, qv, k=10, round_dp=6)
        .withColumn(
            "rank",
            # dim-sized window: cosine_topk already reduced to k=10 rows
            F.row_number().over(
                Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )

    fused = SIM.rrf_fuse([bmr, dnr], id_col="doc_id", k=60, round_dp=6)
    return (
        fused.select(
            "doc_id",
            F.col("rank_0").alias("rank_bm25"),
            F.col("rank_1").alias("rank_dense"),
            "rrf_score",
        )
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Token-budget selection (data-constrained training)
# --------------------------------------------------------------------------
@query(
    "q_token_budget",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens, q_score,
             coalesce(sum(n_tokens) OVER (
               ORDER BY q_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM q
    )
    SELECT doc_id, n_tokens, q_score FROM c WHERE prior < 8000
    """,
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: the best documents by quality score until
    an 8000-token budget is spent — the data-constrained-training policy
    ("train on the best N tokens"). The oracle is the naive global-order
    cumsum; the engine computes the identical kept set via the
    bin-decomposed parallel form (no single-partition window). Integer
    token prefix-sums are exact, so no rounding is needed anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "text")).select(
        "doc_id",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        "q_score",
    )
    return S.select_token_budget(scored, budget=8000)


# --------------------------------------------------------------------------
# N-gram novelty vs the existing corpus
# --------------------------------------------------------------------------
@query(
    "q_novelty",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), ref AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 3 <> 0
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n_sh
      FROM sh WHERE doc_id % 3 = 0 AND len(shingles) > 0
    ), agg AS (
      SELECT e.doc_id,
             any_value(e.n_sh) AS n_sh,
             sum(CASE WHEN ref.s IS NULL THEN 0 ELSE 1 END) AS n_cov
      FROM e LEFT JOIN ref ON e.s = ref.s
      GROUP BY 1
    )
    SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
           1.0 - n_cov / n_sh AS novelty
    FROM agg
    UNION ALL
    SELECT doc_id, 0 AS n_shingles, NULL AS novelty
    FROM sh WHERE doc_id % 3 = 0 AND len(shingles) = 0
    """,
)
def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty of the incoming batch (doc_id % 3 == 0) against the
    existing corpus (the rest): fraction of each new doc's 3-gram
    shingles absent from every reference document — the partial-coverage
    admission signal that complements whole-doc near-dup flags in
    incremental crawl curation."""
    docs = load_table(spark, "documents", sf_dir)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    ref = docs.filter(F.col("doc_id") % 3 != 0)
    return TX.ngram_novelty(new, ref)


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis)
# --------------------------------------------------------------------------
def _wsk_u_sql(salt: str = "wsk") -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(d, {i + 1}, 1)) - 1) * {float(16 ** (7 - i))!r}"
        for i in range(8)
    )
    return f"({terms} + 1.0) / {float(16 ** 8 + 1)!r}"


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
      WHERE len(string_split(text, ' ')) >= 1
    ), keyed AS (
      SELECT doc_id, q_score,
             round(pow({_wsk_u_sql()}, 1.0 / q_score), 12) AS sample_key
      FROM (SELECT doc_id, q_score, md5(CAST(doc_id AS VARCHAR) || 'wsk') AS d
            FROM q WHERE q_score > 0)
    )
    SELECT doc_id, q_score, sample_key FROM keyed
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted exactly-100 sample without replacement
    (Efraimidis-Spirakis keys u^(1/quality) from a portable md5
    uniform): the reproducible draw-an-inspection-set policy where
    better docs are proportionally likelier. Pure projection +
    TakeOrderedAndProject."""
    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "text")).select("doc_id", "q_score")
    return S.weighted_sample_k(scored, "doc_id", "q_score", k=100, salt="wsk")


# --------------------------------------------------------------------------
# BPE tokenizer training (pair statistics + merge rounds)
# --------------------------------------------------------------------------
@query(
    "q_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) GROUP BY 1
    ), sy AS (
      SELECT word, freq, [word[i:i] for i in range(1, len(word) + 1)] AS syms
      FROM w
    ), p AS (
      SELECT freq, syms[i] AS a, syms[i + 1] AS b
      FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM sy
            WHERE len(syms) >= 2)
    )
    SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
    FROM p GROUP BY 1, 2
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round-1 statistics: adjacent character-pair counts over the
    distinct-word table, weighted by word frequency — the aggregate a
    byte-pair-encoding trainer maximizes each round. |vocab|-sized
    explode, one shuffle; corpus size only enters through the word
    frequencies."""
    from .operators import bpe as B

    docs = load_table(spark, "documents", sf_dir)
    return B.pair_counts(B.word_symbol_table(docs)).withColumn(
        "cnt", F.col("cnt").cast("bigint")
    )


def _bpe_train_ctes(num_merges: int) -> list[str]:
    """Shared CTE chain unrolling the full BPE training loop in SQL:
    per round, pair counts over the current symbol tables, a
    (cnt DESC, a, b) argmax, and the greedy leftmost merge applied via
    list_reduce with a list accumulator (DuckDB lambdas reference the
    joined argmax row's columns) — the generated-CTE certification
    idiom over an iterative STRING algorithm. Consumed by both the
    merge-sequence oracle (q_bpe_merges) and the fertility oracle
    (q_bpe_fertility)."""
    ctes = ["""w0 AS (
      SELECT word, count(*) AS freq,
             [word[i:i] for i in range(1, len(word) + 1)] AS syms
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    )"""]
    for i in range(num_merges):
        ctes.append(f"""p{i} AS (
      SELECT a, b, sum(freq) AS cnt FROM (
        SELECT freq, syms[j] AS a, syms[j + 1] AS b
        FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS j
              FROM w{i} WHERE len(syms) >= 2)
      ) GROUP BY 1, 2
    ), t{i} AS (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
    ), w{i + 1} AS (
      SELECT word, freq,
             list_reduce(
               list_transform(w.syms, s -> [s]),
               (acc, x) -> CASE WHEN acc[-1] = t.a AND x[1] = t.b
                                THEN acc[:-2] || [t.a || t.b]
                                ELSE acc || x END
             ) AS syms
      FROM w{i} w CROSS JOIN t{i} t
    )""")
    return ctes


def _bpe_merges_oracle(num_merges: int = 10) -> str:
    ctes = _bpe_train_ctes(num_merges)
    steps = "\n    UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, a, b, CAST(cnt AS BIGINT) AS cnt FROM t{i}"
        for i in range(num_merges)
    )
    return "\n    WITH " + ",\n    ".join(ctes) + "\n    " + steps


def _bpe_fertility_oracle(num_merges: int = 10) -> str:
    """Replay the trained segmentation (w{num_merges} symbol tables)
    against every word OCCURRENCE, grouped by language: fertility =
    pieces per occurrence, floor-scaled (exact-rational idiom)."""
    ctes = _bpe_train_ctes(num_merges)
    ctes.append(f"""seg AS (
      SELECT word, CAST(len(syms) AS BIGINT) AS n_pieces FROM w{num_merges}
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + """
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(s.n_pieces) AS BIGINT) AS n_pieces,
           CAST(floor(10000.0 * sum(s.n_pieces) / count(*)) AS BIGINT)
             AS fertility_x10k
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
          FROM documents) d
    JOIN seg s USING (word)
    GROUP BY 1"""
    )


@query("q_bpe_merges", oracle=_bpe_merges_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten learned BPE merges, FULLY oracle-certified: the unrolled SQL
    replays every round's pair counts, argmax, and greedy leftmost merge
    fold (list_reduce with a list accumulator), so the whole iterative
    tokenizer-training loop is pinned cross-engine — upgraded from
    rows-only once the fold proved SQL-expressible. Emits
    (step, a, b, cnt)."""
    from .operators import bpe as B

    docs = load_table(spark, "documents", sf_dir)
    merges, _ = B.bpe_train(docs, num_merges=10)
    rows = [(i + 1, a, b, int(c)) for i, (a, b, c) in enumerate(merges)]
    return local_rows_df(spark, rows, ["step", "a", "b", "cnt"])


@query("q_bpe_fertility", oracle=_bpe_fertility_oracle())
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language under the 10 certified BPE
    merges: pieces per word OCCURRENCE (frequency-weighted, the number
    multilingual tokenizer evaluations report — high-fertility languages
    pay more sequence length per word, the classic under-representation
    signal that drives vocab-allocation decisions). The trained
    segmentation comes straight from bpe_train's final word table (the
    |vocab|-sized intermediate — broadcastable) joined back to the
    token stream; fertility is the floor-scaled exact rational, and the
    oracle replays training AND segmentation via the shared unrolled
    CTE chain."""
    from .operators import bpe as B

    docs = load_table(spark, "documents", sf_dir)
    _, words = B.bpe_train(docs, num_merges=10)
    seg = words.select("word", F.size("syms").cast("long").alias("n_pieces"))
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.floor(
                F.lit(10000.0) * F.sum("n_pieces") / F.count(F.lit(1))
            ).cast("bigint").alias("fertility_x10k"),
        )
    )


# --------------------------------------------------------------------------
# Curation composite v2: gate -> temperature rebalance -> token budget
# --------------------------------------------------------------------------
@query(
    "q_curate_v2",
    headline=True,
    oracle="""
    WITH q AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
    ), gated AS (
      SELECT * FROM q WHERE q_score >= 0.1
    ), w AS (
      SELECT lang, CAST(sum(n_tok) AS DOUBLE) AS w FROM gated GROUP BY 1
    ), t AS (
      SELECT lang,
             CASE WHEN round(pow((SELECT min(w) FROM w) / w, 0.7), 6) >= 1.0 THEN 'g'
                  ELSE lower(lpad(hex(CAST(floor(round(pow((SELECT min(w) FROM w) / w, 0.7), 6)
                                                 * 4294967296.0) AS BIGINT)), 8, '0'))
             END AS thr
      FROM w
    ), balanced AS (
      SELECT g.* FROM gated g JOIN t USING (lang)
      WHERE substr(md5(CAST(g.doc_id AS VARCHAR) || 'cv2'), 1, 8) < t.thr
    ), c AS (
      SELECT doc_id, lang, n_tok, q_score,
             coalesce(sum(n_tok) OVER (
               ORDER BY q_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM balanced
    ), kept AS (
      SELECT * FROM c WHERE prior < 5000
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM kept GROUP BY 1
    """,
)
def q_curate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation composite v2 — the round-3 policy stack end to end:
    quality gate (q_score >= 0.1) -> mT5 temperature rebalance over
    languages (alpha=0.3, data-dependent in-engine thresholds) ->
    5000-token budget selection (best-first exact prefix sum) -> per-lang
    kept-tokens report. One chained oracle covers all four stages, so the
    driver hash certifies their COMPOSITION, not just each piece."""
    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        "text",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        "q_score",
    )
    gated = scored.filter(F.col("q_score") >= 0.1)
    balanced = S.temperature_rebalance(
        gated, key_col="doc_id", strata_col="lang",
        weight_col=F.col("n_tokens"), alpha=0.3, salt="cv2",
    ).drop("keep_rate", "text")
    kept = S.select_token_budget(
        balanced, budget=5000, quality_col="q_score", token_col="n_tokens"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def _kmeans_cert_oracle(k: int = 8, iters: int = 3) -> str:
    """Unroll the whole k-means fit in SQL: md5-rank seeds, then per
    iteration an argmax assignment (round-before-rank) and a per-dim
    mean M-step (rounded 6dp — avg accumulation order differs across
    engines, and the Spark side rounds identically via round_dp=6), so
    every round consumes identical doubles. Same generated-CTE idiom as
    the PageRank oracle."""
    ctes = [f"""v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ), c0 AS (
      SELECT CAST(rn - 1 AS INT) AS label, list_transform(ve, x -> round(x, 6)) AS cvec
      FROM (
        SELECT vec_id, ve,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM v
      ) WHERE rn <= {k}
    )"""]
    for i in range(iters):
        ctes.append(f"""a{i} AS (
      SELECT vec_id, ve, label, sim FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, label) AS rn
        FROM (
          SELECT v.vec_id, v.ve, c.label,
                 round(list_cosine_similarity(v.ve, c.cvec), 6) AS sim
          FROM v CROSS JOIN c{i} c
        ) s
      ) WHERE rn = 1
    )""")
        if i < iters - 1:
            ctes.append(f"""c{i + 1} AS (
      SELECT label, list(round(c, 6) ORDER BY dim) AS cvec FROM (
        SELECT label, dim, avg(x) AS c FROM (
          SELECT label, unnest(ve) AS x, generate_subscripts(ve, 1) AS dim
          FROM a{i}
        ) GROUP BY label, dim
      ) GROUP BY label
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT label AS assigned_label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(sim), 4) AS mean_sim
    FROM a{iters - 1} GROUP BY 1"""
    )


@query("q_kmeans_fit_cert", oracle=_kmeans_cert_oracle())
def q_kmeans_fit_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means fit, FULLY oracle-certified (k=8, 3 Lloyd
    rounds, round_dp=6): centroids round to 6dp at the seeds and after
    every M-step, so an unrolled generated-CTE oracle replays the whole
    iterative fit — seeds, three assignments, two centroid updates —
    bit-for-bit (the certified sibling of the full-precision rows-only
    q_kmeans_fit, same pattern as the md5 MinHash family). Output:
    per-cluster size + mean assigned similarity."""
    from .operators import similarity as SIM

    emb = load_table(spark, "embeddings", sf_dir)
    assigned, _ = SIM.kmeans_fit_distributed(emb, k=8, iters=3, round_dp=6)
    return assigned.groupBy("assigned_label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("sim"), 4).alias("mean_sim"),
    )


# --------------------------------------------------------------------------
# Cross-source quality calibration
# --------------------------------------------------------------------------
@query(
    "q_quality_calibrate",
    oracle="""
    WITH q AS (
      SELECT doc_id, source,
             least(len(string_split(text, ' ')) / 50, 1.0)
               * (len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' '))) AS q_score
      FROM documents
    )
    SELECT doc_id, source, q_score,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY q_score, doc_id), 6) AS q_calibrated
    FROM q
    """,
)
def q_quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality calibration: per-source percent_rank of the
    raw quality score. Raw scores are not comparable across sources
    (each source has its own score distribution), so a global top-k on
    raw scores over-selects from easy sources; rank-calibrated scores
    make 'top 10% of every source' a single global threshold. One
    source-keyed window; ties break by doc_id; ranks round to 6dp
    (percent_rank divides by n-1 — one IEEE division, rounded for
    engine parity)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    scored = TX.quality_score(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "q_score"
    )
    w = Window.partitionBy("source").orderBy(F.col("q_score"), F.col("doc_id"))
    return scored.withColumn("q_calibrated", F.round(F.percent_rank().over(w), 6))


# --------------------------------------------------------------------------
# Distribution drift (two-sample Kolmogorov-Smirnov)
# --------------------------------------------------------------------------
@query(
    "q_ks_drift",
    oracle="""
    WITH a AS (
      SELECT len(string_split(text, ' ')) AS v FROM documents WHERE doc_id % 2 = 0
    ), b AS (
      SELECT len(string_split(text, ' ')) AS v FROM documents WHERE doc_id % 2 = 1
    ), vals AS (
      SELECT DISTINCT v FROM (SELECT v FROM a UNION ALL SELECT v FROM b)
    ), cdfs AS (
      SELECT vals.v,
             (SELECT count(*) FROM a WHERE a.v <= vals.v)
               / (SELECT CAST(count(*) AS DOUBLE) FROM a) AS cdf_a,
             (SELECT count(*) FROM b WHERE b.v <= vals.v)
               / (SELECT CAST(count(*) AS DOUBLE) FROM b) AS cdf_b
      FROM vals
    )
    SELECT round(max(abs(cdf_a - cdf_b)), 6) AS ks_stat,
           CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b
    FROM cdfs
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on document token-length
    between two corpus halves — the distribution-drift alarm a pipeline
    runs between yesterday's and today's crawl (here: even vs odd ids,
    so the expected answer is 'no drift'). The engine computes both
    empirical CDFs in ONE pass over the distinct value grid (window
    cumsums of per-value counts — no correlated subqueries), where the
    oracle states the textbook definition; CDF values are exact rational
    counts/n, the max rounds to 6dp. The denominators n_a/n_b are
    derived IN-PLAN as whole-grid window sums over the same dim-sized
    count table the cumsums already sort — no driver-side count()
    actions rescanning documents for two scalars (the q_psi_drift
    totals idiom)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    v = TX.token_count(F.col("text")).alias("v")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(v)
    b = docs.filter(F.col("doc_id") % 2 == 1).select(v)
    counts = (
        a.groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
        .join(b.groupBy("v").agg(F.count(F.lit(1)).alias("cb")), ["v"], "full_outer")
        .select(
            "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    # dim-sized window: input is the per-distinct-VALUE count table; v is
    # an integer token-length, so |rows| is bounded by max doc length
    # (hundreds), never corpus-sized. A continuous metric would need
    # pre-binning before this CDF step. The whole-grid frame reuses the
    # same single-partition pass, so totals cost no extra scan.
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdfs = counts.select(
        "v",
        (F.sum("ca").over(w) / F.sum("ca").over(wall).cast("double")).alias("cdf_a"),
        (F.sum("cb").over(w) / F.sum("cb").over(wall).cast("double")).alias("cdf_b"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return cdfs.agg(
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6).alias("ks_stat"),
        # coalesce: an empty corpus leaves the grid empty and max() NULL,
        # where the oracle's scalar count(*) subqueries report 0
        F.coalesce(F.max("na"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.max("nb"), F.lit(0)).cast("bigint").alias("n_b"),
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH a AS (
      SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bin
      FROM documents WHERE doc_id % 2 = 0
    ), b AS (
      SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bin
      FROM documents WHERE doc_id % 2 = 1
    ), ca AS (
      SELECT bin, CAST(count(*) AS DOUBLE) AS c FROM a GROUP BY 1
    ), cb AS (
      SELECT bin, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY 1
    ), grid AS (
      SELECT bin FROM ca UNION SELECT bin FROM cb
    ), m AS (
      SELECT (SELECT CAST(count(*) AS DOUBLE) FROM a) AS na,
             (SELECT CAST(count(*) AS DOUBLE) FROM b) AS nb,
             (SELECT CAST(count(*) AS DOUBLE) FROM grid) AS k
    )
    SELECT CAST(m.k AS BIGINT) AS n_bins,
           round(sum(((coalesce(ca.c, 0) + 0.5) / (m.na + 0.5 * m.k)
                      - (coalesce(cb.c, 0) + 0.5) / (m.nb + 0.5 * m.k))
                     * ln(((coalesce(ca.c, 0) + 0.5) / (m.na + 0.5 * m.k))
                          / ((coalesce(cb.c, 0) + 0.5) / (m.nb + 0.5 * m.k)))),
                 6) AS psi
    FROM grid
    LEFT JOIN ca USING (bin)
    LEFT JOIN cb USING (bin)
    CROSS JOIN m
    GROUP BY m.k
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus halves over
    width-10 token-length bins — the ML-ops drift score next to the KS
    statistic (PSI > 0.2 is the classic retrain alarm; even-vs-odd ids
    here should read ~0). Fixed integer bin edges keep the binning
    engine-portable; +0.5 Laplace smoothing over the union bin grid
    keeps empty bins finite and deterministic; the (pa-pb)·ln(pa/pb)
    sum rounds 6dp per the libm convention."""
    docs = load_table(spark, "documents", sf_dir)
    bin_col = F.floor(TX.token_count(F.col("text")) / 10).cast("bigint").alias("bin")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(bin_col)
    b = docs.filter(F.col("doc_id") % 2 == 1).select(bin_col)
    ca = a.groupBy("bin").agg(F.count(F.lit(1)).cast("double").alias("c_a"))
    cb = b.groupBy("bin").agg(F.count(F.lit(1)).cast("double").alias("c_b"))
    grid = ca.join(cb, "bin", "full_outer").na.fill({"c_a": 0.0, "c_b": 0.0})
    # totals derived in-plan over the (tiny) bin grid — no driver-side
    # count() actions rescanning documents for three scalars
    from pyspark.sql import Window

    w = Window.partitionBy()
    na = F.sum("c_a").over(w)
    nb = F.sum("c_b").over(w)
    k = F.count(F.lit(1)).over(w).cast("double")
    pa = (F.col("c_a") + 0.5) / (na + 0.5 * k)
    pb = (F.col("c_b") + 0.5) / (nb + 0.5 * k)
    scored = grid.select(
        k.alias("k"), ((pa - pb) * F.log(pa / pb)).alias("contrib")
    )
    return scored.groupBy("k").agg(
        F.round(F.sum("contrib"), 6).alias("psi")
    ).select(F.col("k").cast("bigint").alias("n_bins"), "psi")


@query(
    "q_mutual_info",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
      FROM documents GROUP BY 1, 2
    ), n AS (
      SELECT sum(c) AS n FROM o
    ), r AS (
      SELECT lang, sum(c) AS rc FROM o GROUP BY 1
    ), cl AS (
      SELECT source, sum(c) AS cc FROM o GROUP BY 1
    )
    SELECT round(sum((o.c / n.n)
                     * ln((o.c / n.n) / ((r.rc / n.n) * (cl.cc / n.n)))), 6)
             AS mutual_info_nats,
           CAST(n.n AS BIGINT) AS n_docs
    FROM o
    JOIN r USING (lang)
    JOIN cl USING (source)
    CROSS JOIN n
    GROUP BY n.n
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between lang and source (nats) — the
    information-theoretic association score beside the chi-square test
    (MI ~ 0 means knowing the source tells you nothing about language —
    the mixing-policy independence check). Observed cells only (zero
    cells contribute 0 to MI by continuity, unlike chi-square); exact
    integer counts, 6dp-rounded log sum."""
    docs = load_table(spark, "documents", sf_dir)
    o = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    r = o.groupBy("lang").agg(F.sum("c").alias("rc"))
    cl = o.groupBy("source").agg(F.sum("c").alias("cc"))
    n = o.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    pr = F.col("rc") / F.col("n")
    pc = F.col("cc") / F.col("n")
    return (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(cl), "source")
        .crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(F.round(F.sum(p * F.log(p / (pr * pc))), 6).alias("mutual_info_nats"))
        .select("mutual_info_nats", F.col("n").cast("bigint").alias("n_docs"))
    )


@query(
    "q_hhi_sources",
    oracle="""
    WITH s AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
    ), n AS (
      SELECT sum(c) AS n FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           round(sum((c / n.n) * (c / n.n)), 6) AS hhi
    FROM s CROSS JOIN n GROUP BY n.n
    """,
)
def q_hhi_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of source concentration — the
    corpus-diversity companion to the Gini: 1/n_sources (perfectly
    balanced) up to 1.0 (single-source corpus); 1/HHI is the 'effective
    number of sources'. Exact integer counts, one rounded square sum."""
    docs = load_table(spark, "documents", sf_dir)
    s = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n = s.agg(F.sum("c").alias("n"))
    share = F.col("c") / F.col("n")
    return (
        s.crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
        .select("n_sources", "hhi")
    )


@query(
    "q_split_alloc",
    oracle="""
    WITH sz AS MATERIALIZED (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM sz
    ), base AS MATERIALIZED (
      SELECT lang, n,
             CAST((n * 1) // 5 AS BIGINT) AS b,
             (n * 1) % 5 AS rem,
             CAST((t * 1) // 5 AS BIGINT) AS quota
      FROM sz CROSS JOIN tot
    ), alloc AS MATERIALIZED (
      SELECT lang,
             b + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                       <= quota - (SELECT CAST(sum(b) AS BIGINT) FROM base)
                  THEN 1 ELSE 0 END AS alloc
      FROM base
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM ranked r JOIN alloc a USING (lang)
    WHERE r.rn <= a.alloc
    """,
)
def q_split_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size stratified eval carve by largest-remainder
    apportionment: select floor(n/5) documents IN TOTAL with per-lang
    quotas proportional to stratum size — floor quotas plus one extra
    for the largest-remainder strata until the global budget is met,
    membership by deterministic md5 rank. The fraction is the exact
    rational 1/5, so every quota is integer arithmetic (explicit floor
    on both engines — DuckDB CAST rounds where Spark truncates) and the
    total size is certifiable, the property a fixed-budget eval set
    must prove (plain per-stratum Bernoulli only hits the budget in
    expectation). Apportionment runs over the |langs|-row table
    (dim-sized windows); the data-sized rank filter short-circuits via
    WindowGroupLimit per stratum."""
    from .operators.sampling import proportional_allocate

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return proportional_allocate(docs, "lang", "doc_id", num=1, den=5)


def _doc_cluster_oracle(k: int = 8, fit_iters: int = 2) -> str:
    """Unroll feature-hash vectorization + the k-means fit over the
    derived vectors: docs hash into 16 token-count dims (first md5 hex
    char — the q_feature_hash idiom, exact integers), then the standard
    fit replay (md5-rank seeds, round-before-rank assignments, 6dp
    M-steps) with the final E-step's label as the cluster. Output is
    per-cluster size + min-id exemplar — all exact integers."""
    sums = ",\n             ".join(
        f"CAST(sum(CASE WHEN b = '{d}' THEN 1 ELSE 0 END) AS DOUBLE)"
        for d in "0123456789abcdef"
    )
    ctes = [f"""v AS MATERIALIZED (
      SELECT doc_id AS vec_id,
             [{sums}] AS ve
      FROM (
        SELECT doc_id, substr(md5(t), 1, 1) AS b
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM documents)
      )
      GROUP BY doc_id
    ), c0 AS MATERIALIZED (
      SELECT CAST(rn - 1 AS INT) AS label, list_transform(ve, x -> round(x, 6)) AS cvec
      FROM (
        SELECT vec_id, ve,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM v
      ) WHERE rn <= {k}
    )"""]
    for i in range(fit_iters):
        ctes.append(f"""a{i} AS MATERIALIZED (
      SELECT vec_id, ve, label, sim FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, label) AS rn
        FROM (
          SELECT v.vec_id, v.ve, c.label,
                 round(list_cosine_similarity(v.ve, c.cvec), 6) AS sim
          FROM v CROSS JOIN c{i} c
        ) s
      ) WHERE rn = 1
    )""")
        if i < fit_iters - 1:
            ctes.append(f"""c{i + 1} AS MATERIALIZED (
      SELECT label, list(round(c, 6) ORDER BY dim) AS cvec FROM (
        SELECT label, dim, avg(x) AS c FROM (
          SELECT label, unnest(ve) AS x, generate_subscripts(ve, 1) AS dim
          FROM a{i}
        ) GROUP BY label, dim
      ) GROUP BY label
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT label AS cluster, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(vec_id) AS BIGINT) AS exemplar
    FROM a{fit_iters - 1} GROUP BY 1"""
    )


@query("q_doc_cluster", oracle=_doc_cluster_oracle())
def q_doc_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text clustering WITHOUT embeddings: every document feature-hashes
    into a 16-dim token-count vector (first md5 hex char per token — no
    vocabulary build, no OOV, the hashing-trick featurizer), then
    spherical k-means (k=8, 2 rounds, round_dp=6) clusters the derived
    vectors and the fit's final E-step labels each doc. Output:
    per-cluster size + min-id exemplar. The whole chain — vectorize,
    seed, every E/M round — replays in the unrolled-CTE oracle with
    exact integer inputs, tying the text tier to the certified k-means
    machinery; at 100 TB the featurization is one narrow agg (16
    conditional counts, map-side combined) and the fit is the usual
    broadcast E-step."""
    from .operators import similarity as SIM

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).select(
        "doc_id", F.substring(F.md5("t"), 1, 1).alias("b")
    )
    fv = toks.groupBy("doc_id").agg(
        F.array(
            *[
                F.sum(F.when(F.col("b") == d, 1).otherwise(0)).cast("double")
                for d in "0123456789abcdef"
            ]
        ).alias("fv")
    )
    assigned, _ = SIM.kmeans_fit_distributed(
        fv, k=8, iters=2, id_col="doc_id", vec_col="fv", round_dp=6
    )
    return assigned.groupBy(F.col("assigned_label").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("exemplar"),
    )


@query(
    "q_ndcg",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), top10 AS (
      SELECT doc_id,
             round(sum(
               ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * (1.2 + 1))
               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl))
             ), 6) AS score
      FROM tf t
      JOIN dl d USING (doc_id)
      JOIN dfreq f USING (term)
      CROSS JOIN consts c
      WHERE t.term IN {_SEARCH_TERMS!r}
      GROUP BY t.doc_id
      ORDER BY score DESC, doc_id LIMIT 10
    ), rel AS (
      SELECT doc_id, CAST(LEAST(sum(tf), 4) AS INT) AS rel
      FROM tf WHERE term IN {_SEARCH_TERMS!r} GROUP BY 1
    ), ranked AS (
      SELECT COALESCE(r.rel, 0) AS rel,
             row_number() OVER (ORDER BY t.score DESC, t.doc_id) AS pos
      FROM top10 t LEFT JOIN rel r USING (doc_id)
    ), ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
      FROM rel ORDER BY rel DESC, doc_id LIMIT 10
    ), d AS (
      SELECT round(sum(((1 << rel) - 1) / log2(CAST(pos + 1 AS DOUBLE))), 6) AS dcg
      FROM ranked
    ), i AS (
      SELECT round(sum(((1 << rel) - 1) / log2(CAST(pos + 1 AS DOUBLE))), 6) AS idcg
      FROM ideal
    )
    SELECT d.dcg AS dcg, i.idcg AS idcg, round(d.dcg / i.idcg, 6) AS ndcg
    FROM d, i
    """,
)
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the BM25 retrieval (q_bm25_search's exact ranking)
    against graded relevance = total query-term OCCURRENCES capped at 4
    — deliberately NOT what BM25 optimizes (tf saturation + idf
    weighting disagree with raw counts), so the measured ndcg is a real
    number (~0.81 at sf0.01), not a vacuous 1.0. The search-quality
    metric that closes the retrieval-evaluation loop (BM25 index ->
    ranking -> measured ranking quality). IDCG is the corpus-wide
    ideal: the best top-10 achievable over ALL matching documents, not
    just the retrieved set, so ndcg < 1 is a real ranking deficit.
    Gains use shiftleft (exact integers) over log2 position discounts;
    the 10-addend sums round 6dp per the libm convention
    (q_bm25_search's own idiom)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    scores = TX.bm25_scores(docs, k1=1.2, b=0.75)
    top = (
        scores.filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )
    rel = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.least(F.count(F.lit(1)), F.lit(4)).cast("int").alias("rel"))
    )
    gain = "((shiftleft(1, rel) - 1)) / log2(CAST(pos + 1 AS DOUBLE))"
    ranked = (
        top.join(rel, "doc_id", "left")
        .na.fill({"rel": 0})
        .select(
            "rel",
            # dim-sized window: input is the post-limit top-10 rows
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
            .alias("pos"),
        )
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), F.col("doc_id"))
        .limit(10)
        .select(
            "rel",
            # dim-sized window: input is the post-limit ideal top-10 rows
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), F.col("doc_id")))
            .alias("pos"),
        )
    )
    d = ranked.agg(F.round(F.sum(F.expr(gain)), 6).alias("dcg"))
    i = ideal.agg(F.round(F.sum(F.expr(gain)), 6).alias("idcg"))
    return d.crossJoin(i).select(
        "dcg", "idcg", F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg")
    )


# --------------------------------------------------------------------------
# Diversity-aware subset selection (r8): the coverage/redundancy axis of
# curation the dedup tier does not address — dedup removes near-copies,
# these pick maximally SPREAD exemplars. Greedy k-center (Gonzalez 1985;
# Sener & Savarese 2018 core-set selection) and Maximal Marginal Relevance
# (Carbonell & Goldstein 1998). Both are k-round greedy loops whose every
# round is ONE corpus scan vs a broadcast <= k x dim selected matrix + a
# TakeOrderedAndProject top-1 — the kmeans-E-step shape, k scans total,
# no data-sized shuffle or driver transfer. The oracles unroll the full
# greedy trajectory (one CTE per round, argmax replayed as ORDER BY ...
# LIMIT 1 with the lowest-id tie-break) so the ENTIRE selection sequence
# is certified, not just the final set.
# --------------------------------------------------------------------------

_DIVERSITY_K = 8
_MMR_LAMBDA = 0.5

_DIV_V_CTE = """v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    )"""

_DIV_SEED_RN = """row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)"""


def _greatest(terms: list[str]) -> str:
    return terms[0] if len(terms) == 1 else f"greatest({', '.join(terms)})"


def _kcenter_oracle(k: int) -> str:
    """Unrolled farthest-first replay: per round i, mind = 1 −
    max over s1..s{i−1} of round(cos, 6) — the engine computes the same
    1 − rowmax on rounded cosines, and IEEE rounding monotonicity makes
    the two forms identical bit-for-bit."""
    parts = [
        f"""s1 AS MATERIALIZED (
      SELECT vec_id, ve FROM (
        SELECT vec_id, ve, {_DIV_SEED_RN} AS rn FROM v
      ) WHERE rn = 1
    )"""
    ]
    for i in range(2, k + 1):
        cos_terms = [
            f"round(list_cosine_similarity(v.ve, (SELECT ve FROM s{j})), 6)"
            for j in range(1, i)
        ]
        notin = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i)
        )
        parts.append(f"""s{i} AS MATERIALIZED (
      SELECT vec_id, ve, mind FROM (
        SELECT v.vec_id, v.ve, 1 - {_greatest(cos_terms)} AS mind
        FROM v WHERE v.vec_id NOT IN ({notin})
      ) ORDER BY mind DESC, vec_id LIMIT 1
    )""")
    unions = [
        "SELECT CAST(1 AS BIGINT) AS rank, vec_id,"
        " CAST(NULL AS DOUBLE) AS sel_dist FROM s1"
    ] + [
        f"SELECT CAST({i} AS BIGINT), vec_id, mind FROM s{i}"
        for i in range(2, k + 1)
    ]
    return (
        "WITH " + _DIV_V_CTE + ",\n    " + ",\n    ".join(parts)
        + "\n    " + "\n    UNION ALL ".join(unions)
    )


def _mmr_oracle(k: int, lam: float) -> str:
    """Unrolled MMR replay: rel computed once (rounded cosine to the
    6dp-rounded corpus-mean query vector), each round's score =
    lam·rel − (1−lam)·max over selected of round(cos, 6) — literal
    multiply/subtract order matching the engine expression exactly."""
    l1, l2 = repr(float(lam)), repr(float(1.0 - lam))
    parts = [
        f"""qv AS MATERIALIZED (
      SELECT list(round(am, 6) ORDER BY dim) AS ve FROM (
        SELECT dim, avg(x) AS am FROM (
          SELECT unnest(ve) AS x, generate_subscripts(ve, 1) AS dim FROM v
        ) GROUP BY dim
      )
    ), rel AS MATERIALIZED (
      SELECT vec_id, ve,
             round(list_cosine_similarity(ve, (SELECT ve FROM qv)), 6) AS rel
      FROM v
    ), s1 AS MATERIALIZED (
      SELECT vec_id, ve, rel, CAST(rel AS DOUBLE) AS score FROM (
        SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 1
      )
    )"""
    ]
    for i in range(2, k + 1):
        cos_terms = [
            f"round(list_cosine_similarity(r.ve, (SELECT ve FROM s{j})), 6)"
            for j in range(1, i)
        ]
        notin = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i)
        )
        parts.append(f"""s{i} AS MATERIALIZED (
      SELECT vec_id, ve, rel, score FROM (
        SELECT r.vec_id, r.ve, r.rel,
               {l1} * r.rel - {l2} * {_greatest(cos_terms)} AS score
        FROM rel r WHERE r.vec_id NOT IN ({notin})
      ) ORDER BY score DESC, vec_id LIMIT 1
    )""")
    unions = [
        "SELECT CAST(1 AS BIGINT) AS rank, vec_id, score FROM s1"
    ] + [
        f"SELECT CAST({i} AS BIGINT), vec_id, score FROM s{i}"
        for i in range(2, k + 1)
    ]
    return (
        "WITH " + _DIV_V_CTE + ",\n    " + ",\n    ".join(parts)
        + "\n    " + "\n    UNION ALL ".join(unions)
    )


@query("q_kcenter_select", oracle=_kcenter_oracle(_DIVERSITY_K))
def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center core-set selection over the embedding corpus
    (Sener & Savarese 2018): the k exemplars that 2-approx-minimize the
    maximum distance from any corpus vector to its nearest exemplar —
    the labeling/distillation-budget picker. Output is the full greedy
    trajectory (rank, vec_id, sel_dist): sel_dist non-increasing is the
    textbook optimality certificate, and the oracle replays every
    round's argmax including tie-breaks."""
    emb = load_table(spark, "embeddings", sf_dir)
    return DIV.kcenter_select(emb, k=_DIVERSITY_K)


@query("q_kcenter_fused", oracle=_kcenter_oracle(_DIVERSITY_K))
def q_kcenter_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSED greedy k-center (VERDICT r8 item 5 — the 100 TB form):
    several provisional farthest points accepted per corpus scan, each
    re-validated driver-side against the pass's earlier accepts with a
    one-quantum dominance margin, so the trajectory is BIT-IDENTICAL to
    q_kcenter_select (it shares that query's oracle verbatim) while the
    scan count drops from k to ~⌈k/batch_rounds⌉. The oracle therefore
    certifies not just the output but the fusion's exactness claim:
    a single accepted-out-of-order point would break the replay."""
    emb = load_table(spark, "embeddings", sf_dir)
    return DIV.kcenter_select_fused(emb, k=_DIVERSITY_K, batch_rounds=4)


@query("q_mmr_select", oracle=_mmr_oracle(_DIVERSITY_K, _MMR_LAMBDA))
def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    1998) against the 6dp-rounded corpus-mean query vector (the most
    central query — deterministic and never a corpus member): rank 1 is
    the most relevant row, later ranks trade relevance against
    similarity to what is already selected at λ = 0.5 — the standard
    RAG diverse-retrieval re-ranker, certified round by round."""
    emb = load_table(spark, "embeddings", sf_dir)
    return DIV.mmr_select(emb, k=_DIVERSITY_K, lam=_MMR_LAMBDA)


@query("q_mmr_fused", oracle=_mmr_oracle(_DIVERSITY_K, _MMR_LAMBDA))
def q_mmr_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSED MMR re-ranking (the q_kcenter_fused move applied to the
    second greedy loop): several provisional rows accepted per corpus
    scan, each re-validated with the one-quantum dominance margin
    against the pass's earlier accepts — trajectory AND recorded scores
    bit-identical to q_mmr_select (shares its oracle verbatim) at
    ~batch_rounds× fewer scans. Stale MMR scores are upper bounds
    (acceptance only raises redundancy), which is what makes the
    prefix-acceptance argument sound."""
    emb = load_table(spark, "embeddings", sf_dir)
    return DIV.mmr_select_fused(
        emb, k=_DIVERSITY_K, lam=_MMR_LAMBDA, batch_rounds=4
    )


# --------------------------------------------------------------------------
# Loss-aware domain reweighting (r8) — the third mixing mechanism next to
# temperature rebalancing (token-share-only) and DSIR (per-doc importance):
# tilt the domain mixture toward domains the current LM finds HARD, the
# weight shape of DoReMi (Xie et al. 2023). In-engine the proxy loss is
# the corpus-unigram surprisal (the zero-dependency stand-in the unigram-
# logprob filter already certifies); with a real proxy/reference model the
# same pipeline consumes its per-doc losses — that model is the documented
# out-of-container seam. Every stage is aggregates + scalar libm, so the
# whole weight derivation replays in SQL.
# --------------------------------------------------------------------------

_DOMAIN_REWEIGHT_ETA = 1.0


def _domain_reweight_ctes(eta: float) -> str:
    """WITH-chain (after ``WITH``) ending in ``dw(source, n_docs,
    n_tokens, mean_surprisal, prior, tilt, weight)`` — shared by the
    weight report and the sampling-plan composite."""
    e = repr(float(eta))
    return f"""toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), counts AS (
      SELECT term, count(*) AS term_n FROM toks GROUP BY 1
    ), total AS (SELECT count(*) AS total_n FROM toks),
    perdoc AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(-ln(CAST(c.term_n AS DOUBLE) / total.total_n)), 6)
               AS surp
      FROM toks t JOIN counts c USING (term), total GROUP BY 1
    ), dom AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
             round(avg(p.surp), 6) AS mean_surprisal
      FROM documents d JOIN perdoc p USING (doc_id) GROUP BY 1
    ), agg AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
             min(mean_surprisal) AS lmin
      FROM dom
    ), tw AS (
      SELECT dom.*,
             round(CAST(n_tokens AS DOUBLE) / tot, 6) AS prior,
             round(exp({e} * (mean_surprisal - lmin)), 6) AS tilt
      FROM dom, agg
    ), un AS (
      SELECT tw.*, round(prior * tilt, 6) AS unnorm FROM tw
    ), z AS (SELECT sum(unnorm) AS z FROM un),
    dw AS (
      SELECT source, n_docs, n_tokens, mean_surprisal, prior, tilt,
             round(unnorm / z, 6) AS weight
      FROM un, z
    )"""


def _domain_reweight_oracle(eta: float) -> str:
    return f"""
    WITH {_domain_reweight_ctes(eta)}
    SELECT * FROM dw
    """


def _domain_reweight_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (source, n_docs, n_tokens, mean_surprisal, prior, tilt,
    weight) frame both the weight report and the sampling-plan
    composite read — one derivation, no drift."""
    return domain_reweight_frame_from_docs(load_table(spark, "documents", sf_dir))


def domain_reweight_frame_from_docs(docs: DataFrame) -> DataFrame:
    """DataFrame-parametric form of the DoReMi-shaped weight derivation
    (used by the driver queries via _domain_reweight_frame and by
    tools/scale_probe.py on its synthetically grown corpus, so the
    deep-factor drift evidence measures EXACTLY the production
    derivation)."""
    lp = TX.unigram_logprob_score(docs)
    perdoc = (
        docs.select("doc_id", "source")
        .join(lp, "doc_id")
        .select(
            "doc_id", "source", "n_tokens",
            F.round(-F.col("mean_logprob"), 6).alias("surp"),
        )
    )
    dom = perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("surp"), 6).alias("mean_surprisal"),
    )
    agg = dom.agg(
        F.sum("n_tokens").alias("tot"),
        F.min("mean_surprisal").alias("lmin"),
    )
    tw = dom.crossJoin(F.broadcast(agg)).select(
        "source", "n_docs", "n_tokens", "mean_surprisal",
        F.round(F.col("n_tokens").cast("double") / F.col("tot"), 6).alias("prior"),
        F.round(
            F.exp(
                F.lit(float(_DOMAIN_REWEIGHT_ETA))
                * (F.col("mean_surprisal") - F.col("lmin"))
            ),
            6,
        ).alias("tilt"),
    )
    un = tw.withColumn("unnorm", F.round(F.col("prior") * F.col("tilt"), 6))
    z = un.agg(F.sum("unnorm").alias("z"))
    return un.crossJoin(F.broadcast(z)).select(
        "source", "n_docs", "n_tokens", "mean_surprisal", "prior", "tilt",
        F.round(F.col("unnorm") / F.col("z"), 6).alias("weight"),
    )


@query("q_domain_reweight", oracle=_domain_reweight_oracle(_DOMAIN_REWEIGHT_ETA))
def q_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-aware domain mixture weights, DoReMi-shaped (Xie et al.
    2023): each source's weight is its token-share PRIOR times an
    exponentiated-gradient TILT exp(η·(loss_d − min_d loss)) toward
    hard domains, normalized — where the in-engine proxy loss is the
    certified corpus-unigram surprisal (macro-averaged over the
    domain's docs). Distinct from q_temperature_mix (reweights by
    token share alone — no notion of difficulty) and q_dsir_score
    (per-DOC importance, not a domain mixture). The min-loss shift
    makes the tilt numerically stable AND deterministic (the smallest
    tilt is exactly exp(0) = 1).

    Scale shape: the unigram-LM scan (explode → dictionary agg →
    broadcast join back), one per-doc agg, one |domains|-row agg, two
    scalar broadcasts — nothing data-sized past the first agg. 6dp
    rounds at every libm/accumulation point (ln, exp, avgs) per the
    established convention."""
    return _domain_reweight_frame(spark, sf_dir)


def _reweight_apply_oracle(eta: float, salt: str = "drw") -> str:
    return f"""
    WITH {_domain_reweight_ctes(eta)},
    ratio AS (
      SELECT source, round(weight / prior, 6) AS ratio FROM dw
    ), mx AS (SELECT max(ratio) AS maxr FROM ratio),
    rates AS (
      SELECT source, round(ratio / maxr, 6) AS keep_rate FROM ratio, mx
    ), thr AS (
      SELECT source, keep_rate,
             CASE WHEN keep_rate >= 1.0 THEN 'g'
                  ELSE lower(lpad(hex(CAST(floor(keep_rate * 4294967296.0)
                                           AS BIGINT)), 8, '0'))
             END AS thr
      FROM rates
    )
    SELECT d.doc_id, d.source, t.keep_rate
    FROM documents d JOIN thr t USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '{salt}'), 1, 8) < t.thr
    """


@query(
    "q_reweight_apply",
    oracle=_reweight_apply_oracle(_DOMAIN_REWEIGHT_ETA),
)
def q_reweight_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the DoReMi-shaped mixture as a SAMPLING PLAN — the
    composite that turns q_domain_reweight's target weights into kept
    rows: per-domain keep rate = (weight/prior) / max(weight/prior)
    (downsample-only — the domain needing the largest upweight keeps
    everything, every other domain thins proportionally, so the
    REALIZED token mixture tracks the target weights), then the same
    deterministic md5-threshold Bernoulli every sampler here uses
    (apply_rate_table, in-engine hex conversion). One weight
    derivation + one |domains|-row rate table broadcast onto the
    corpus — the corpus never shuffles, and the whole policy replays
    from the data alone."""
    docs = load_table(spark, "documents", sf_dir)
    dw = _domain_reweight_frame(spark, sf_dir)
    ratio = dw.select(
        "source", F.round(F.col("weight") / F.col("prior"), 6).alias("ratio")
    )
    mx = ratio.agg(F.max("ratio").alias("maxr"))
    rates = ratio.crossJoin(F.broadcast(mx)).select(
        "source", F.round(F.col("ratio") / F.col("maxr"), 6).alias("keep_rate")
    )
    kept = S.apply_rate_table(
        docs.select("doc_id", "source"), rates, "doc_id", "source", salt="drw"
    )
    return kept.select("doc_id", "source", "keep_rate")


# --------------------------------------------------------------------------
# UniMax epoch-capped budget allocation (r8) — the fourth mixing mechanism:
# temperature rebalancing reshapes token SHARES, DSIR scores per-doc
# importance, DoReMi tilts toward hard domains — none of them reasons
# about REPETITION. UniMax (Chung et al., ICLR 2023) allocates a total
# training budget as uniformly as possible subject to a per-stratum epoch
# cap, so tail languages stop absorbing budget at cap x their own size
# instead of being oversampled into memorization. The waterfilling loop
# is replayed exactly in SQL: the capped set is a prefix of the
# ascending-capacity order, certified by a running-min condition.
# --------------------------------------------------------------------------

_UNIMAX_BUDGET_MULT = 1.6
_UNIMAX_EPOCH_CAP = 2.0

# q_unimax_pack encodes each manifest row as item_id = doc_id * STRIDE +
# copy_idx and decodes with DIV/%; copy_idx ranges over [0, floor(cap)]
# (the fractional copy reuses index n_full), so the stride must strictly
# exceed the largest copy_idx or a future cap raise silently corrupts the
# packed doc_id/copy_idx decode (ADVICE r8). The guard fails loudly at
# import time instead.
_UNIMAX_PACK_STRIDE = 8
assert int(_UNIMAX_EPOCH_CAP) + 1 < _UNIMAX_PACK_STRIDE, (
    f"_UNIMAX_PACK_STRIDE={_UNIMAX_PACK_STRIDE} cannot encode copy_idx up "
    f"to {int(_UNIMAX_EPOCH_CAP)} distinctly — raise the stride with the cap"
)


def _unimax_ctes(budget_mult: float, epoch_cap: float) -> str:
    """WITH-chain (after ``WITH``) ending in ``ua(lang, n_docs, n_tokens,
    capacity, capped, alloc_tokens, epochs, budget_share)`` — shared by
    the allocation report and the repetition-manifest composite."""
    bm = repr(float(budget_mult))
    ec = repr(float(epoch_cap))
    return f"""dom AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS DOUBLE) * {bm} AS budget,
             count(*) AS d
      FROM dom
    ), ord AS (
      SELECT lang, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) * {ec} AS capacity,
             row_number() OVER (
               ORDER BY CAST(n_tokens AS DOUBLE) * {ec}, lang) AS rn,
             coalesce(sum(CAST(n_tokens AS DOUBLE) * {ec}) OVER (
               ORDER BY CAST(n_tokens AS DOUBLE) * {ec}, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS cum_prev
      FROM dom
    ), cnd AS (
      SELECT ord.*, tot.budget, tot.d,
             CASE WHEN capacity * (tot.d - rn + 1) <= tot.budget - cum_prev
                  THEN 1 ELSE 0 END AS cond
      FROM ord, tot
    ), cap AS (
      SELECT cnd.*,
             min(cond) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
               AS capped
      FROM cnd
    ), lvl AS (
      SELECT sum(CASE WHEN capped THEN capacity ELSE 0.0 END) AS capped_cap,
             sum(CASE WHEN capped THEN 1 ELSE 0 END) AS n_capped
      FROM cap
    ), ua AS (
      SELECT lang, n_docs, n_tokens, capacity, capped,
             round(alloc, 6) AS alloc_tokens,
             round(alloc / n_tokens, 6) AS epochs,
             round(alloc / budget, 6) AS budget_share
      FROM (
        SELECT cap.*,
               CASE WHEN capped THEN capacity
                    WHEN d > lvl.n_capped
                      THEN (budget - lvl.capped_cap) / (d - lvl.n_capped)
                    ELSE 0.0 END AS alloc
        FROM cap, lvl
      )
    )"""


@query(
    "q_unimax_alloc",
    oracle=f"""
    WITH {_unimax_ctes(_UNIMAX_BUDGET_MULT, _UNIMAX_EPOCH_CAP)}
    SELECT * FROM ua
    """,
)
def q_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax epoch-capped budget allocation over languages (Chung et
    al., ICLR 2023): spread a budget of 1.6x the corpus's tokens as
    uniformly as possible across languages, with no language repeated
    past 2 epochs of its own data. On this corpus the four tail
    languages hit the 2-epoch cap at both driver scales and the head
    language absorbs the leftover at ~1.03-1.08 epochs — exactly the
    published motivation (heads near one epoch, tails capped, nothing
    oversampled hundreds of times the way temperature sampling does to
    rare languages). Exact waterfilling replayed in SQL via the
    prefix-capped running-min identity; determinism is BY CONSTRUCTION
    (integer-valued capacities and prefix sums are exact at any
    addition order) rather than by rounding. Scale shape: one
    |langs|-row aggregate then windows/aggregates over that bounded
    frame only."""
    docs = load_table(spark, "documents", sf_dir)
    return S.unimax_alloc(
        docs.select("lang", TX.token_count(F.col("text")).alias("__w")),
        strata_col="lang",
        weight_col="__w",
        budget_mult=_UNIMAX_BUDGET_MULT,
        epoch_cap=_UNIMAX_EPOCH_CAP,
    )


def _unimax_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The |langs|-row repetition plan (lang, __n_full, __frac) the
    manifest composites broadcast — one allocation derivation shared by
    the batch manifest and its streamed shape, no drift."""
    docs = load_table(spark, "documents", sf_dir)
    ua = S.unimax_alloc(
        docs.select("lang", TX.token_count(F.col("text")).alias("__w")),
        strata_col="lang",
        weight_col="__w",
        budget_mult=_UNIMAX_BUDGET_MULT,
        epoch_cap=_UNIMAX_EPOCH_CAP,
    )
    return ua.select(
        "lang",
        F.floor("epochs").cast("bigint").alias("__n_full"),
        F.round(F.col("epochs") - F.floor("epochs"), 6).alias("__frac"),
    )


def _unimax_copies(rows: DataFrame, plan: DataFrame) -> DataFrame:
    """Expand (doc_id, lang) rows into the (doc_id, lang, copy_idx)
    repetition manifest under a broadcast plan — stateless per row
    given the plan, which is what lets the streamed shape run it
    unchanged per micro-batch."""
    digest = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("umx"))), 1, 8
    )
    copies = (
        rows.select("doc_id", "lang")
        .join(F.broadcast(plan), "lang")
        .select(
            "doc_id",
            "lang",
            (
                F.col("__n_full")
                + F.when(
                    digest < S._hex_threshold_col(F.col("__frac")), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("__n_copies"),
        )
    )
    return copies.filter(F.col("__n_copies") > 0).select(
        "doc_id",
        "lang",
        F.explode(
            F.sequence(F.lit(1), F.col("__n_copies").cast("int"))
        ).alias("copy_idx"),
    )


def _unimax_manifest_ctes() -> str:
    """WITH-chain (after ``WITH``) ending in ``man(doc_id, lang,
    copy_idx)`` — shared by the manifest queries and the pack
    composite."""
    return f"""{_unimax_ctes(_UNIMAX_BUDGET_MULT, _UNIMAX_EPOCH_CAP)},
    pl AS (
      SELECT lang, CAST(floor(epochs) AS BIGINT) AS n_full,
             round(epochs - floor(epochs), 6) AS frac
      FROM ua
    ), thr AS (
      SELECT lang, n_full,
             CASE WHEN frac >= 1.0 THEN 'g'
                  ELSE lower(lpad(hex(CAST(floor(frac * 4294967296.0)
                                           AS BIGINT)), 8, '0'))
             END AS thr
      FROM pl
    ), copies AS (
      SELECT d.doc_id, d.lang,
             t.n_full + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)
                                              || 'umx'), 1, 8) < t.thr
                             THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN thr t USING (lang)
    ), man AS (
      SELECT doc_id, lang,
             CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_idx
      FROM copies WHERE n_copies > 0
    )"""


_UNIMAX_MANIFEST_ORACLE = f"""
    WITH {_unimax_manifest_ctes()}
    SELECT doc_id, lang, copy_idx FROM man
    """


@query("q_unimax_manifest", oracle=_UNIMAX_MANIFEST_ORACLE)
def q_unimax_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the UniMax allocation as a REPETITION MANIFEST — the
    composite that turns q_unimax_alloc's per-language epoch counts
    into one row per (document, copy) for the training data plane:
    every doc repeats floor(epochs) times, plus one more with
    probability frac(epochs) via the same deterministic md5-threshold
    Bernoulli every sampler here uses — so the realized token count
    per language matches the allocation in expectation, exactly
    reproducibly. This is the side the downsample-only mixers
    (q_reweight_apply, q_temperature_mix) cannot express: epochs > 1
    NEED duplication, and the manifest is what q_epoch_shuffle /
    q_shard_manifest consume upstream. Scale shape: the |langs|-row
    allocation broadcast onto the corpus, then a per-row
    explode(sequence(1, n_copies)) bounded by the epoch cap — output
    <= cap x corpus rows, no shuffle of the corpus itself."""
    docs = load_table(spark, "documents", sf_dir)
    return _unimax_copies(docs, _unimax_plan(spark, sf_dir))


@query("q_stream_unimax", oracle=_UNIMAX_MANIFEST_ORACLE)
def q_stream_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE-INGEST UniMax manifest — the repetition plan derived ONCE
    from the standing corpus snapshot (the policy-from-snapshot shape
    every streamed mixer here uses: a global allocation cannot run
    statelessly inside the stream), then each arriving micro-batch of
    documents expands against the broadcast |langs|-row plan in
    flight. The per-row expansion is stateless given the frozen plan,
    so the fold is order-independent and published batch_id-idempotent
    (dynamic partition overwrite) — the merged store equals the batch
    manifest VERBATIM and the batch oracle certifies the stream. With
    this, the repetition side of mixing has both execution shapes,
    like the margin-mining and curation tiers before it."""
    from .queries_streaming import _stream_fold_partials, _write_partial

    docs = load_table(spark, "documents", sf_dir)
    plan = _unimax_plan(spark, sf_dir).localCheckpoint()

    def fold(batch_df: DataFrame, out: str, bid: int) -> None:
        _write_partial(_unimax_copies(batch_df, plan), out, bid)

    partials = _stream_fold_partials(
        spark, "stream_unimax_", docs.select("doc_id", "lang"), fold
    )
    return spark.read.parquet(partials).select("doc_id", "lang", "copy_idx")



_UNIMAX_PACK_ORACLE = f"""
    WITH {_unimax_manifest_ctes()},
    d AS (
      SELECT m.doc_id, m.copy_idx,
             m.doc_id * {_UNIMAX_PACK_STRIDE} + m.copy_idx AS item_id,
             CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS n_len,
             md5(CAST(m.doc_id * {_UNIMAX_PACK_STRIDE} + m.copy_idx AS VARCHAR)) AS okey
      FROM man m JOIN documents doc USING (doc_id)
    ), o AS (
      SELECT doc_id, copy_idx, item_id, n_len,
             CAST(COALESCE(sum(n_len) OVER (
                    ORDER BY okey, item_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS BIGINT) AS off
      FROM d WHERE n_len > 0
    ), s AS (
      SELECT doc_id, copy_idx, n_len, off,
             CAST(unnest(generate_series(off // 2048,
                                         (off + n_len - 1) // 2048))
                  AS BIGINT) AS seq_id
      FROM o
    )
    SELECT doc_id, copy_idx, seq_id,
           greatest(CAST(0 AS BIGINT), seq_id * 2048 - off) AS doc_from,
           least(n_len, seq_id * 2048 + 2048 - off) AS doc_to,
           greatest(CAST(0 AS BIGINT), off - seq_id * 2048) AS pos_in_seq,
           least(n_len, seq_id * 2048 + 2048 - off)
             - greatest(CAST(0 AS BIGINT), seq_id * 2048 - off) AS n_tok
    FROM s
    """


@query("q_unimax_pack", oracle=_UNIMAX_PACK_ORACLE)
def q_unimax_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix -> manifest -> pack, end-to-end: the UniMax repetition
    manifest fed straight into concat-and-chunk sequence packing — the
    full mixture-execution path a pretraining run ships (allocate the
    budget, materialize the per-copy manifest, lay the token stream
    into fixed-2048 training sequences). Each manifest row becomes an
    independent packable item keyed item_id = doc_id*8 + copy_idx
    (copy_idx <= epoch cap << 8, so the key is unique and the
    md5-order re-deal treats each COPY as its own document — the two
    copies of a capped doc land at independent stream positions, the
    decorrelation epoch re-shuffling exists to provide). Scale shape:
    the manifest's broadcast-join + bounded explode, one equi-join to
    the token counts, then pack_sequences' single range shuffle
    (parallel_prefix_sum offsets — never a single-reducer window);
    arithmetic all-integer past the 6dp-rounded epochs, so the whole
    composition replays bit-exactly in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    man = _unimax_copies(docs, _unimax_plan(spark, sf_dir))
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_len")
    )
    items = man.join(toks, "doc_id").select(
        (F.col("doc_id") * F.lit(_UNIMAX_PACK_STRIDE) + F.col("copy_idx")).alias(
            "item_id"
        ),
        "n_len",
    )
    spans = S.pack_sequences(items, "item_id", "n_len", capacity=2048)
    return spans.select(
        F.expr(f"item_id DIV {_UNIMAX_PACK_STRIDE}").alias("doc_id"),
        (F.col("item_id") % F.lit(_UNIMAX_PACK_STRIDE)).cast("int").alias("copy_idx"),
        "seq_id",
        "doc_from",
        "doc_to",
        "pos_in_seq",
        "n_tok",
    )
