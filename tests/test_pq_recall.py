"""Product-quantization QUALITY tests (the pq.py twin of
test_ann_recall.py): the oracle gate proves the ADC pipeline computes
what it claims deterministically; these pin that the approximation is
GOOD — and that the exact re-rank stage repairs what 4-byte codes lose.

Measured at sf0.01 (recall@5, 50 query vectors, m=4, 1 Lloyd iter):
- raw ADC, ksub=8:               0.10   (4 bytes/vector — too coarse)
- raw ADC, ksub=32:              0.27
- ADC ksub=16 + rerank 100:      0.76
- ADC ksub=32 + rerank 100:      0.88
The bounds below are regression floors under those measurements."""

from pyspark.sql import functions as F

from squirreling_spark.qutil import t

SF = "/root/testdata/sf0.01"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def _recall(exact, approx):
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return hits / sum(len(exact[q]) for q in exact)


def test_pq_rerank_recall_floor(spark):
    from squirreling_spark.pipeline.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        pq_rerank_topk,
    )
    from squirreling_spark.pipeline.similarity import cosine_topk_bruteforce

    e = t(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = _topk_sets(cosine_topk_bruteforce(q, e, k=5))
    cb = pq_codebooks(e, "embedding", "vec_id", m=4, ksub=32, dim=64)
    codes = pq_encode(e, "embedding", "vec_id", cb)
    raw = _topk_sets(pq_adc_topk(q, codes, cb, k=5))
    rer = _topk_sets(
        pq_rerank_topk(q, e, codes, cb, k=5, rerank=100)
    )
    assert set(rer) == set(exact)  # every query answered
    r_raw, r_rer = _recall(exact, raw), _recall(exact, rer)
    assert r_rer >= 0.75, f"re-ranked recall regressed: {r_rer}"
    assert r_rer > r_raw, "re-rank must improve on raw ADC"


def test_pq_code_table_is_small(spark):
    """The selling point: the search-time state is m ints per vector."""
    from squirreling_spark.pipeline.pq import pq_codebooks, pq_encode

    e = t(spark, SF, "embeddings")
    cb = pq_codebooks(e, "embedding", "vec_id", m=4, ksub=8, dim=64)
    codes = pq_encode(e, "embedding", "vec_id", cb)
    n = e.count()
    assert codes.count() == 4 * n
    assert codes.columns == ["vec_id", "sub", "code"]
    assert cb.count() <= 4 * 8  # empty cells may drop, never grow


def test_ivfpq_recall_floor_and_probe_monotonicity(spark):
    """IVF-PQ quality (pipeline/pq.py::ivfpq_*): floors pinned under the
    graded config, plus the defining IVF property — more probes, more
    recall. Measured at sf0.01 (recall@5, 50 queries, k_coarse=8,
    coarse_iters=1, m=4, ksub=16, rerank=40): raw ADC 0.156 @ nprobe=2;
    re-ranked 0.460 @ nprobe=2, 0.564 @ nprobe=4. The exact-search
    ceiling of the same probed cells is ~0.57 — on this 500-vector
    near-random corpus the coarse quantizer, not PQ, is the binding
    constraint, and re-rank recovers most of what the cells contain."""
    from squirreling_spark.pipeline.pq import (
        ivfpq_build,
        ivfpq_rerank_topk,
        ivfpq_search,
    )
    from squirreling_spark.pipeline.similarity import cosine_topk_bruteforce

    e = t(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = _topk_sets(cosine_topk_bruteforce(q, e, k=5))
    coarse, cb, codes = ivfpq_build(
        e, "embedding", "vec_id", k_coarse=8, m=4, ksub=16, dim=64
    )
    raw2 = _topk_sets(ivfpq_search(q, coarse, cb, codes, k=5, nprobe=2))
    rer2 = _topk_sets(
        ivfpq_rerank_topk(q, e, coarse, cb, codes, k=5, rerank=40, nprobe=2)
    )
    rer4 = _topk_sets(
        ivfpq_rerank_topk(q, e, coarse, cb, codes, k=5, rerank=40, nprobe=4)
    )
    assert set(rer2) == set(exact)  # every query answered
    r_raw2 = _recall(exact, raw2)
    r_rer2, r_rer4 = _recall(exact, rer2), _recall(exact, rer4)
    assert r_rer2 >= 0.40, f"IVF-PQ re-ranked recall regressed: {r_rer2}"
    assert r_rer2 > r_raw2, "re-rank must improve on raw ADC"
    assert r_rer4 > r_rer2, "more probes must raise recall"


def test_ivfpq_codes_carry_cell_and_stay_small(spark):
    """The inverted-list contract: codes = (id, cell, sub, code), m rows
    per vector, cell consistent within a vector — and search-time state
    is still m small ints (+ a cell id) per vector."""
    from squirreling_spark.pipeline.pq import ivfpq_build

    e = t(spark, SF, "embeddings")
    n = e.count()
    _, _, codes = ivfpq_build(
        e, "embedding", "vec_id", k_coarse=8, m=4, ksub=16, dim=64
    )
    assert codes.columns == ["vec_id", "cell", "sub", "code"]
    assert codes.count() == 4 * n
    assert (
        codes.groupBy("vec_id")
        .agg(F.countDistinct("cell").alias("nc"))
        .filter(F.col("nc") != 1)
        .count()
        == 0
    )
    mx = codes.agg(F.max("code"), F.max("sub")).collect()[0]
    assert mx[1] == 3  # m=4 subspaces


def test_int8_quantize_exact_codes(spark):
    from squirreling_spark.pipeline.pq import int8_quantize

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.5, 0.5, -0.5, -0.5])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {
        r.vec_id: r
        for r in int8_quantize(df, "embedding", "vec_id").collect()
    }
    import hashlib

    # vec 1: amax=1.0, scale=1/127; codes floor(x*127+0.5) = 127,-63,32,0
    # (floor(-63.5)=-64? -0.5*127=-63.5, +0.5 -> -63.0, floor = -63)
    r1 = rows[1]
    assert r1.scale == 1.0 / 127
    expect = "/".join(str(c) for c in [127, -63, 32, 0])
    assert r1.fp_codes == hashlib.md5(expect.encode()).hexdigest()
    assert r1.n_clipped == 0 and r1.n_dims == 4
    # vec 2: all |x| equal -> every code exactly ±127, zero error
    r2 = rows[2]
    expect2 = "/".join(str(c) for c in [127, 127, -127, -127])
    assert r2.fp_codes == hashlib.md5(expect2.encode()).hexdigest()
    assert r2.l2_err == 0.0
