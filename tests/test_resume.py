"""M4 gates: crash→resume equals single-shot build; no-op resume; manifest
metrics present; id determinism + sha256 invariant (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearch.build import load_index
from sparksearch.checkpoint import (
    build_resumable,
    committed_units,
    manifest_df,
    resume_plan,
    resume_plan_df,
)

N_UNITS = 6
SEG_COLS = ["term", "range_id", "first_doc_id", "last_doc_id", "n",
            "doc_gaps", "tfs", "dls", "max_score", "bucket"]


def _segments_sorted(spark, path):
    seg, _, stats = load_index(spark, path)
    return sorted(map(tuple, seg.select(SEG_COLS).collect())), stats


def test_crash_resume_equals_single_shot(spark, docs_sf0001, tmp_path):
    single = str(tmp_path / "single")
    build_resumable(spark, docs_sf0001, single, n_units=N_UNITS,
                    n_buckets=8, n_ranges=4)

    crashy = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected crash"):
        build_resumable(spark, docs_sf0001, crashy, n_units=N_UNITS,
                        n_buckets=8, n_ranges=4, fail_after_units=2)
    assert len(committed_units(crashy)) == 2
    assert sorted(resume_plan(crashy, N_UNITS)) == list(range(2, N_UNITS))

    stats2 = build_resumable(spark, docs_sf0001, crashy, n_units=N_UNITS,
                             n_buckets=8, n_ranges=4)
    assert stats2["built_units"] == N_UNITS - 2

    d1, s1 = _segments_sorted(spark, single)
    d2, s2 = _segments_sorted(spark, crashy)
    s1.pop("built_units", None)
    s2.pop("built_units", None)
    s1.pop("n_units", None)
    s2.pop("n_units", None)
    assert s1 == s2
    assert d1 == d2  # byte-identical segments: resume ≡ single shot


def test_noop_resume(spark, docs_sf0001, tmp_path):
    path = str(tmp_path / "idx")
    build_resumable(spark, docs_sf0001, path, n_units=4, n_buckets=8, n_ranges=4)
    again = build_resumable(spark, docs_sf0001, path, n_units=4,
                            n_buckets=8, n_ranges=4)
    assert again["built_units"] == 0  # R1: nothing to do
    assert resume_plan(path, 4) == []
    assert resume_plan_df(spark, path, 4).count() == 0


def test_manifest_metrics(spark, docs_sf0001, tmp_path):
    path = str(tmp_path / "idx")
    build_resumable(spark, docs_sf0001, path, n_units=4, n_buckets=8,
                    n_ranges=4, finalize=False)
    m = manifest_df(spark, path)
    rows = m.collect()
    assert len(rows) == 4
    assert {r["partition_id"] for r in rows} == set(range(4))
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == docs_sf0001.count()  # lineage covers every doc exactly once
    for r in rows:
        assert r["n_postings"] > 0
        assert r["postings_per_sec"] > 0
        assert r["docs_per_sec"] > 0
        assert r["committed_at"]
    # Pin the lineage shape: resume_manifest is rows-only at the driver
    # (timings aren't SQL-comparable), so this schema assertion is what
    # keeps the check from silently degrading.
    assert dict(m.dtypes) == {
        "partition_id": "int", "n_docs": "bigint", "n_postings": "bigint",
        "n_terms": "bigint", "build_secs": "double",
        "postings_per_sec": "double", "docs_per_sec": "double",
        "committed_at": "string",
    }
    # The catalog entry projects these four columns — they must keep existing.
    proj = m.select("partition_id", "n_docs", "n_postings", "postings_per_sec")
    assert proj.columns == ["partition_id", "n_docs", "n_postings", "postings_per_sec"]


def test_ids_and_sha256_invariant(spark):
    from gen_corpus import gen_corpus
    from sparksearch.ids import (
        assign_doc_ids_dense,
        assign_doc_ids_hashed,
        audit_id_collisions,
        sha256_mismatches,
    )

    pdf = gen_corpus(200, seed=42)
    corpus = spark.createDataFrame(pdf)
    with_ids = assign_doc_ids_dense(corpus)
    ids = [r["doc_id"] for r in with_ids.select("doc_id").collect()]
    assert sorted(ids) == list(range(200))  # dense, stable

    hashed = assign_doc_ids_hashed(corpus)
    assert audit_id_collisions(hashed).count() == 0

    # S3 invariant: generation-time hashes match row-wise
    assert sha256_mismatches(with_ids, with_ids.select("doc_id", "sha256")).count() == 0

    # and a corrupted row is caught
    corrupted = with_ids.withColumn(
        "content",
        F.when(F.col("doc_id") == 0, F.lit("tampered")).otherwise(F.col("content")),
    )
    assert sha256_mismatches(corrupted, with_ids.select("doc_id", "sha256")).count() == 1
