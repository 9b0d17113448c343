"""Product quantization (pq_fit / pq_encode / pq_adc_topk) invariants:
code-range and determinism contracts, the zero-exchange ADC plan shape,
and ADC ranking quality against the exact L2 baseline. The bit-exact
fit+encode+ADC replay itself is certified by q_embedding_pq_cert's
unrolled DuckDB oracle (verify_sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.operators import similarity as SIM

from .conftest import SF_DIR

DIM, M, K_CODES = 64, 4, 16


def _fit_encode(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    book = SIM.pq_fit(emb, dim=DIM, m=M, k_codes=K_CODES, iters=2, round_dp=6)
    codes = SIM.pq_encode(emb, book, dim=DIM, m=M)
    return emb, book, codes


def test_pq_codes_shape_and_range(spark):
    """Every vector gets exactly m codes, each a trained code id in
    [0, k_codes); the codebook holds at most m*k_codes*sub_dim rows."""
    emb, book, codes = _fit_encode(spark)
    n = emb.count()
    rows = codes.collect()
    assert len(rows) == n
    trained = {
        (r["sub"], r["code"]) for r in book.select("sub", "code").distinct().collect()
    }
    for r in rows:
        assert len(r["codes"]) == M
        for j, c in enumerate(r["codes"]):
            assert 0 <= c < K_CODES
            assert (j, c) in trained  # never emits an untrained code
    assert book.count() <= M * K_CODES * (DIM // M)


def test_pq_fit_deterministic(spark):
    """md5-rank seeds + rounded aggregates: two independent fits agree
    bit-for-bit (the certified-fit contract the oracle relies on)."""
    emb = load_table(spark, "embeddings", SF_DIR)
    a = SIM.pq_fit(emb, dim=DIM, m=M, k_codes=K_CODES, iters=2, round_dp=6)
    b = SIM.pq_fit(emb, dim=DIM, m=M, k_codes=K_CODES, iters=2, round_dp=6)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_pq_adc_plan_zero_exchange(spark):
    """The 100 TB contract of ADC search: the final plan is scan ->
    Arrow encode -> JVM LUT fold -> TakeOrderedAndProject. No Exchange
    anywhere — scoring reads m bytes per row and top-k is per-partition
    heaps; and the scoring itself is JVM expressions (exactly ONE
    ArrowEvalPython stage, the encoder)."""
    emb, book, codes = _fit_encode(spark)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    plan = (
        SIM.pq_adc_topk(codes, book, qv, k=10, m=M, k_codes=K_CODES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("ArrowEvalPython") == 1


def test_pq_adc_ranking_quality(spark):
    """A 4x16 codebook over 64-dim UNclustered synthetic vectors is very
    lossy (quantization distortion ~ neighbor-distance spread), so the
    quality contract is asserted where PQ is actually deployed — the
    TWO-STAGE pipeline (Jégou et al. §V): ADC shortlists 50 from the
    codes alone, exact cosine re-ranks. Floors: the query's own row
    (vec_id 0) in the raw-ADC top-3, and two-stage recall@10 >= 0.4 vs
    the exact baseline (measured 0.5; sign-LSH / random-projection
    measure the same 0.5 here — q_ann_quality)."""
    emb, book, codes = _fit_encode(spark)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    adc = [r["vec_id"] for r in
           SIM.pq_adc_topk(codes, book, qv, k=10, m=M, k_codes=K_CODES).collect()]
    assert 0 in adc[:3]
    two_stage = [r["vec_id"] for r in
                 SIM.pq_ann_topk(emb, codes, book, qv, k=10, shortlist=50,
                                 m=M, k_codes=K_CODES).collect()]
    exact = [r["vec_id"] for r in
             SIM.cosine_topk(emb, qv, k=10, round_dp=6).collect()]
    recall = len(set(two_stage) & set(exact)) / 10.0
    assert recall >= 0.4, f"two-stage PQ recall@10 {recall} vs exact"


def test_pq_compression_ratio(spark):
    """The point of PQ: m single-byte codes replace dim float32s. The
    codes column is array<int> of length m — the storage contract the
    64x claim rests on (int here for Spark ergonomics; the payload is
    m values bounded by k_codes=16, i.e. 4 bits of entropy each)."""
    _, _, codes = _fit_encode(spark)
    assert codes.schema["codes"].dataType.simpleString() == "array<int>"
    assert codes.select(F.max(F.size("codes"))).first()[0] == M
