"""Approximate-ANN QUALITY tests: the oracle gate proves the approximate
paths compute what they claim deterministically; these tests additionally
measure that the approximation is GOOD — recall against the exact
brute-force answer. An IVF/LSH index with recall 0.2 would pass a
correctness hash and still be useless; this is the guard.

Measured at sf0.01 (recall@5 over the 10 query vectors):
- knn_ivf (ad-hoc every-50th-vector centroids, nprobe=2): 0.46
- knn_ivf_trained (k-means 2 rounds, k=10, nprobe=2):      0.86
- knn_join_lsh (sign-LSH bands):                            0.38
The bounds below are regression floors under those measurements, not
tuning targets."""

from squirreling_spark import inventory

inventory.load_all()

SF = "/root/testdata/sf0.01"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def _recall(exact, approx, queries):
    hits = sum(len(exact[q] & approx.get(q, set())) for q in queries)
    total = sum(len(exact[q]) for q in queries)
    return hits / total


def test_ivf_trained_beats_adhoc_centroids(spark):
    exact = _topk_sets(inventory.QUERIES["knn_bruteforce"](spark, SF))
    adhoc = _topk_sets(inventory.QUERIES["knn_ivf"](spark, SF))
    trained = _topk_sets(inventory.QUERIES["knn_ivf_trained"](spark, SF))
    assert set(trained) == set(exact)  # every query answered
    r_adhoc = _recall(exact, adhoc, exact)
    r_trained = _recall(exact, trained, exact)
    assert r_trained >= 0.75, f"trained-IVF recall collapsed: {r_trained:.2f}"
    assert r_trained > r_adhoc, (
        f"k-means training stopped helping: trained {r_trained:.2f} "
        f"<= ad-hoc {r_adhoc:.2f}"
    )
    assert r_adhoc >= 0.35, f"ad-hoc IVF recall collapsed: {r_adhoc:.2f}"


def test_lsh_self_join_finds_true_neighbors(spark):
    """knn_join_lsh is a self-join (every vector), brute force answers 10
    query vectors — compare on the overlap."""
    exact = _topk_sets(inventory.QUERIES["knn_bruteforce"](spark, SF))
    lsh = _topk_sets(inventory.QUERIES["knn_join_lsh"](spark, SF))
    qs = set(exact) & set(lsh)
    assert len(qs) >= 5  # LSH must at least produce candidates for most
    recall = _recall(exact, lsh, qs)
    assert recall >= 0.3, f"LSH kNN recall collapsed: {recall:.2f}"


def test_ann_recall_curve_monotone_in_nprobe(spark, sf001):
    from squirreling_spark import inventory

    inventory.load_all()
    rows = {
        r.nprobe: r
        for r in inventory.QUERIES["ann_recall_curve"](spark, sf001).collect()
    }
    assert set(rows) == {1, 2, 4}
    # probed cells are supersets -> recall is monotone non-decreasing
    assert rows[1].n_hits <= rows[2].n_hits <= rows[4].n_hits
    for r in rows.values():
        assert r.recall_ppm == r.n_hits * 1_000_000 // 125
        assert 0 <= r.n_hits <= 125
