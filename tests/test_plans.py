"""Plan-level tests: registry hygiene, LSH recall vs exact baselines."""

import pytest

from cinescrapers_spark.plans import registry


def test_registry_sane():
    reg = registry()
    assert len(reg) >= 30
    with_oracle = [n for n, (_, sql) in reg.items() if sql]
    assert len(with_oracle) >= 25
    for name, (fn, _) in reg.items():
        assert callable(fn), name


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH-verified pairs must equal exact-Jaccard pairs (band math bounds
    the miss probability at ~3e-4 per pair at θ=0.8)."""
    from cinescrapers_spark.plans.dedup import q_dedup_jaccard, q_dedup_minhash_lsh

    exact = {
        (r.source, r.doc_a, r.doc_b)
        for r in q_dedup_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.source, r.doc_a, r.doc_b)
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    missed = len(exact - lsh)
    assert missed <= max(1, int(0.01 * len(exact))), f"LSH missed {missed}/{len(exact)}"


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    from cinescrapers_spark.plans.similarity import q_ann_bruteforce, q_ann_lsh

    exact = {(r.q_id, r.vec_id) for r in q_ann_bruteforce(spark, sf_dir).collect()}
    approx = {(r.q_id, r.vec_id) for r in q_ann_lsh(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    # random-hyperplane banding on near-orthogonal synthetic vectors is a
    # weak filter; assert the plumbing works and recall is nontrivial
    assert len(approx) > 0
    assert recall >= 0.2, f"ANN recall {recall:.2f}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(df.columns) == 5
    assert rows is not None


@pytest.mark.parametrize("name", ["q_pricing_summary", "q_top1_per_group", "q_dedup_exact"])
def test_queries_run_at_sf0001(spark, sf_dir, name):
    reg = registry()
    fn, _ = reg[name]
    assert fn(spark, sf_dir).count() >= 0
