"""Structured Streaming tests: foreachBatch MERGE ingest (availableNow) and
the watermarked windowed aggregate."""

import datetime
import os

import pandas as pd
import pytest

from cinescrapers_spark.dims import CINEMA_SITES
from cinescrapers_spark.schemas import PAGE
from cinescrapers_spark.sources.fixtures import generate_pages
from cinescrapers_spark.streaming.ingest import ShowtimesStore
from cinescrapers_spark.streaming.stream import start_ingest_stream, windowed_event_counts

NOW = datetime.datetime(1998, 8, 1, 9, 0, 0)


def test_stream_ingest_available_now(spark, tmp_path):
    pages, _ = generate_pages(n_per_site=2)
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    spark.createDataFrame(pd.DataFrame(pages), schema=PAGE).write.mode(
        "append"
    ).parquet(pages_dir)

    site_dim = spark.createDataFrame(
        pd.DataFrame([{"site": s, "cinema_shortcode": c} for c, s, _ in CINEMA_SITES])
    ).dropDuplicates(["site"])
    store = ShowtimesStore(spark, str(tmp_path / "st"), site_dim)
    q = start_ingest_stream(
        spark, pages_dir, store, str(tmp_path / "ckpt"), now=NOW
    )
    q.awaitTermination(120)
    df = store.read()
    assert df is not None and df.count() > 0
    assert df.select("id").distinct().count() == df.count()


def test_windowed_event_counts_batch_semantics(spark, sf_dir):
    # the windowed agg is stream-ready; validate its semantics in batch
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(events, window="6 hours").collect()
    assert out
    total = sum(r.cnt for r in out)
    assert total == events.count()  # tumbling windows partition the stream


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState URL dedup: duplicates must be suppressed
    ACROSS micro-batches (state store), within batches (min-url exemplar),
    and per-host state must not leak between hosts."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.streaming.stateful import dedup_url_stream

    src = str(tmp_path / "urls")
    os.makedirs(src)
    schema = "host string, url string, url_hash long"

    def drop(rows, name):
        df = spark.createDataFrame(rows, schema).withColumn(
            "url_hash", F.xxhash64("url")
        )
        df.coalesce(1).write.mode("append").parquet(src + "/" + name)

    drop(
        [
            ("a.com", "https://a.com/1", 0),
            ("a.com", "https://a.com/1", 0),  # within-batch dup
            ("a.com", "https://a.com/2", 0),
            ("b.com", "https://b.com/1", 0),
        ],
        "b1",
    )
    drop(
        [
            ("a.com", "https://a.com/1", 0),  # cross-batch dup
            ("a.com", "https://a.com/3", 0),  # fresh
            ("b.com", "https://a.com/1", 0),  # same url text, OTHER host: fresh
        ],
        "b2",
    )

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        src + "/*"
    )
    out_dir = str(tmp_path / "out")
    q = (
        dedup_url_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.url) for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("a.com", "https://a.com/1"),
        ("a.com", "https://a.com/2"),
        ("a.com", "https://a.com/3"),
        ("b.com", "https://b.com/1"),
        ("b.com", "https://a.com/1"),  # per-host state: no cross-host leak
    }


def test_stream_harvest_exactly_once(spark, tmp_path):
    """Card drops stream into the image harvester: cross-batch dedup via
    the seen-set, and a restart from the checkpoint does not re-acquire
    (idempotent tick commits + at-least-once foreachBatch = exactly-once
    images table)."""
    import pandas as pd  # noqa: F401  (pattern parity with module tests)

    from cinescrapers_spark.crawl.harvest import ImageHarvester
    from cinescrapers_spark.streaming.stream import start_harvest_stream

    cards_dir = str(tmp_path / "cards")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(cards_dir)

    def drop(rows):
        spark.createDataFrame(rows, "url string, caption string").coalesce(
            1
        ).write.mode("append").parquet(cards_dir)

    # overlapping posters across two drops; caption tie resolved by min
    drop([(f"https://h/img/{i}.jpg", f"cap {i}") for i in range(30)])
    drop([(f"https://h/img/{i}.jpg", f"zzz {i}") for i in range(20, 50)])

    harv = ImageHarvester(str(tmp_path / "harvest"), num_shards=4)
    q = start_harvest_stream(spark, cards_dir, harv, ckpt)
    q.awaitTermination(120)

    imgs = {r["image_id"]: r["caption"] for r in harv.read(spark).collect()}
    assert len(imgs) == 50  # 0..49, overlap deduped
    # restart from the same checkpoint: no new batches → nothing re-acquired
    q2 = start_harvest_stream(spark, cards_dir, harv, ckpt)
    q2.awaitTermination(120)
    assert {r["image_id"] for r in harv.read(spark).collect()} == set(imgs)


def test_stream_neardup_incremental(spark, tmp_path, sf_dir):
    """Streaming incremental near-dup: document drops arriving as
    micro-batches must reproduce the full-batch LSH pair set, and a
    restarted stream must pick up only NEW drops (checkpointed,
    exactly-once pair runs)."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.plans import load
    from cinescrapers_spark.plans.dedup import q_dedup_minhash_lsh
    from cinescrapers_spark.plans.incremental import IncrementalNearDupIndex
    from cinescrapers_spark.streaming.stream import start_neardup_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs_dir = str(tmp_path / "drops")
    os.makedirs(docs_dir)
    ckpt = str(tmp_path / "ckpt")
    idx = IncrementalNearDupIndex(str(tmp_path / "idx"))

    # drop 1 + 2, stream them
    for part in (0, 1):
        docs.filter(F.pmod("doc_id", F.lit(3)) == part).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)
    q = start_neardup_stream(spark, docs_dir, idx, ckpt)
    q.awaitTermination(120)
    runs_after_two = len(idx.pairs_table.manifest())
    assert runs_after_two >= 1

    # drop 3 arrives; a RESTARTED stream processes only the new file
    docs.filter(F.pmod("doc_id", F.lit(3)) == 2).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    q2 = start_neardup_stream(spark, docs_dir, idx, ckpt)
    q2.awaitTermination(120)

    got = set()
    for e in idx.pairs_table.manifest():
        df = spark.read.parquet(idx.pairs_table.snapshot_dir(e["snapshot_id"]))
        got |= {(r.source, r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}
    full = {
        (r.source, r.doc_a, r.doc_b, r.jaccard)
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert got == full


def _clustered_embeddings_pdf(n_queries=5):
    """Same clustered corpus as tests/test_plans.py::_clustered_embeddings
    (8 separated 16-dim clusters, noisy labels, queries inside 0..4)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    k_clusters, dim, per = 8, 16, 50
    centers = rng.normal(0, 10.0, (k_clusters, dim))
    rows = []
    for i in range(n_queries):
        v = centers[i] + rng.normal(0, 0.5, dim)
        rows.append({"vec_id": i, "label": -1, "embedding": [float(x) for x in v]})
    vid = n_queries
    for cl in range(k_clusters):
        for _ in range(per):
            v = centers[cl] + rng.normal(0, 0.5, dim)
            label = cl if rng.random() > 0.2 else int(rng.integers(0, k_clusters))
            rows.append(
                {"vec_id": vid, "label": label, "embedding": [float(x) for x in v]}
            )
            vid += 1
    return pd.DataFrame(rows), k_clusters


def test_ann_index_stream_equals_batch_feed(spark, tmp_path):
    """Stream-fed IVF index (file drops → foreachBatch → add_batch) must
    search identically to a batch-fed index over the same three batches;
    a RESTARTED stream (same checkpoint) must process ONLY newly-dropped
    files — the streaming crash-resume contract (VERDICT r4 next #5)."""
    import os

    from pyspark.sql import functions as F

    from cinescrapers_spark.plans.incremental_ivf import IncrementalIVFIndex
    from cinescrapers_spark.streaming.stream import start_ann_index_stream

    pdf, _k = _clustered_embeddings_pdf()
    emb = spark.createDataFrame(pdf)
    cand = emb.filter("vec_id >= 5")
    queries = emb.filter("vec_id < 5").selectExpr("vec_id as q_id", "embedding")

    # batch-fed ground truth: identical batch split (vec_id mod 3)
    ref = IncrementalIVFIndex(str(tmp_path / "ref"), lloyd_iters=2)
    for t in (1, 2, 3):
        ref.add_batch(cand.filter(F.pmod("vec_id", F.lit(3)) == t - 1), tick=t)
    want = {(r.q_id, r.vec_id) for r in ref.search(queries, nprobe=2).collect()}

    vecs_dir = str(tmp_path / "drops")
    os.makedirs(vecs_dir)
    ckpt = str(tmp_path / "ckpt")
    idx = IncrementalIVFIndex(str(tmp_path / "idx"), lloyd_iters=2)

    # drop batches 1 + 2, stream them
    for part in (0, 1):
        cand.filter(F.pmod("vec_id", F.lit(3)) == part).coalesce(1).write.mode(
            "append"
        ).parquet(vecs_dir)
    q = start_ann_index_stream(spark, vecs_dir, idx, ckpt)
    q.awaitTermination(120)
    assert len(idx.cells_table.manifest()) >= 1
    assert idx.centroids(spark) is not None  # first batch trained

    # batch 3 arrives; a RESTARTED stream (kill + same checkpoint)
    # processes only the new file
    cand.filter(F.pmod("vec_id", F.lit(3)) == 2).coalesce(1).write.mode(
        "append"
    ).parquet(vecs_dir)
    q2 = start_ann_index_stream(spark, vecs_dir, idx, ckpt)
    q2.awaitTermination(120)

    got = {(r.q_id, r.vec_id) for r in idx.search(queries, nprobe=2).collect()}
    assert got == want


def test_dedup_pipeline_stream_end_to_end(spark, sf_dir, tmp_path):
    """Document drops → streaming LSH pairs → streaming canonical labels:
    after all drops, the persisted labels must equal the full-batch
    q_dedup_components output; a restarted stream consumes only new
    drops and still merges components across micro-batches."""
    import os

    from pyspark.sql import functions as F

    from cinescrapers_spark.plans import load
    from cinescrapers_spark.plans.dedup import q_dedup_components
    from cinescrapers_spark.plans.incremental import IncrementalNearDupIndex
    from cinescrapers_spark.plans.incremental_cc import IncrementalComponents
    from cinescrapers_spark.streaming.stream import start_dedup_pipeline_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs_dir = str(tmp_path / "drops")
    os.makedirs(docs_dir)
    ckpt = str(tmp_path / "ckpt")
    idx = IncrementalNearDupIndex(str(tmp_path / "lsh"))
    cc = IncrementalComponents(str(tmp_path / "cc"))

    for part in (0, 1):
        docs.filter(F.pmod("doc_id", F.lit(3)) == part).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)
    q = start_dedup_pipeline_stream(spark, docs_dir, idx, cc, ckpt)
    q.awaitTermination(180)

    docs.filter(F.pmod("doc_id", F.lit(3)) == 2).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    q2 = start_dedup_pipeline_stream(spark, docs_dir, idx, cc, ckpt)
    q2.awaitTermination(180)

    got = {r.doc_id: r.component_id for r in cc.labels(spark).collect()}
    want = {
        r.doc_id: r.component_id
        for r in q_dedup_components(spark, sf_dir).collect()
    }
    assert got == want
