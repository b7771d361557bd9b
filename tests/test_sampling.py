"""Sequence packing and importance resampling: hand-math + determinism."""

from __future__ import annotations

import hashlib
import math

from sparksearch.sampling import importance_resample, sequence_packing


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sequence_packing_hand_math(spark):
    dl_df = spark.createDataFrame(
        [(0, 4), (1, 5), (2, 3), (3, 10), (4, 2)], "doc_id long, dl long"
    )
    out = {
        (r.shard, r.seq_id): (r.n_docs, r.n_tokens, r.n_spanning)
        for r in sequence_packing(dl_df, budget=10, n_shards=1).collect()
    }
    # one shard; starts: 0,4,9,12,22 -> seqs 0,0,0,1,2
    assert out == {
        (0, 0): (3, 12, 1),  # docs 0,1,2 start here; doc 2 (9..11) spans
        (0, 1): (1, 10, 1),  # doc 3 (12..21) spans into seq 2
        (0, 2): (1, 2, 0),   # doc 4 fits
    }


def test_sequence_packing_sharding_is_h60(spark):
    dl_df = spark.createDataFrame(
        [(i, 5) for i in range(20)], "doc_id long, dl long"
    )
    got = {
        r.shard
        for r in sequence_packing(dl_df, budget=100, n_shards=4).collect()
    }
    assert got == {_h60_py(str(i)) % 4 for i in range(20)}
    # per-shard token totals must equal the shard's doc count x 5
    tot = {
        r.shard: r.n_tokens
        for r in sequence_packing(dl_df, budget=100, n_shards=4).collect()
    }
    from collections import Counter

    want = Counter(_h60_py(str(i)) % 4 for i in range(20))
    assert tot == {s: n * 5 for s, n in want.items()}


def test_importance_resample_matches_brute_force(spark):
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(0, "a a b", "en"), (1, "b c", "de"), (2, "a c c", "en"), (3, "c c", "de")],
        "doc_id long, text string, lang string",
    )
    tf_df, _, ts, _ = corpus_stats(docs)
    out = [
        (r.rank, r.doc_id, r.skey)
        for r in sorted(
            importance_resample(tf_df, docs, ts, k=3).collect(),
            key=lambda r: r.rank,
        )
    ]
    # brute-force twin: DSIR logw (Laplace over joint vocab) then A-Res keys
    cf = {"a": 3, "b": 2, "c": 5}
    cf_t = {"a": 3, "b": 1, "c": 2}
    c_src, c_tgt, v = 10, 6, 3
    lr = {
        t: round(
            math.log((cf_t[t] + 1) / (c_tgt + v)) - math.log((cf[t] + 1) / (c_src + v)),
            9,
        )
        for t in cf
    }
    tfs = {0: {"a": 2, "b": 1}, 1: {"b": 1, "c": 1}, 2: {"a": 1, "c": 2}, 3: {"c": 2}}
    keys = []
    for d, terms in tfs.items():
        logw = round(sum(n * lr[t] for t, n in terms.items()), 6)
        u = (_h60_py(str(d)) % 1_000_000 + 0.5) / 1_000_000.0
        # fully-log A-Res key: order-equivalent to u^(1/w), overflow-free
        keys.append((logw - math.log(-math.log(u)), -d))
    keys.sort(reverse=True)
    exp = [(i + 1, -nd, round(key, 6)) for i, (key, nd) in enumerate(keys[:3])]
    assert out == exp


def test_importance_resample_is_deterministic(spark):
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(i, f"a b c token{i % 5}", "en" if i % 2 else "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    tf_df, _, ts, _ = corpus_stats(docs)
    a = importance_resample(tf_df, docs, ts, k=10).collect()
    b = importance_resample(
        tf_df.repartition(7), docs, ts, k=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ngram_decontamination_hand_math(spark):
    """Split assignment is h60(str(doc_id)) % 100: ids 1,2 -> train,
    6 -> val, 0,9,11 -> test (computed, pinned here). A test doc sharing an
    8-token run with a train doc has exactly the windows inside that run
    dirty; a clean test doc is emitted with dirty=0; val docs and short
    test docs never appear; train-only overlap does not mark train docs."""
    from sparksearch.sampling import ngram_decontamination

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " x1 y1"),                      # train, carries the run
            (2, "unrelated train words here entirely"),  # train
            (6, shared + " valish"),                     # val — must be ignored
            (0, shared + " clean1 clean2 clean3"),       # test: 11 toks, 8 wins
            (9, "w1 w2 w3 w4 w5 w6 w7"),                 # test: clean, 4 wins
            (11, "too short"),                           # test: < k, no row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["dirty_windows"], r["dirty_frac"])
        for r in ngram_decontamination(docs, k=4).collect()
    }
    # doc 0: windows at starts 1..8; starts 1..5 lie inside the shared run
    assert out[0] == (8, 5, round(5 / 8, 6))
    assert out[9] == (4, 0, 0.0)
    assert set(out) == {0, 9}


def test_ngram_decontamination_val_ignored_as_source(spark):
    """Overlap with a VAL doc is not contamination — only train counts."""
    from sparksearch.sampling import ngram_decontamination

    run = "p1 p2 p3 p4 p5"
    docs = spark.createDataFrame(
        [
            (6, run + " valtail"),       # val carries the run
            (0, run + " t1 t2 t3"),      # test shares it
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["dirty_windows"])
        for r in ngram_decontamination(docs, k=4).collect()
    }
    assert out == {0: (5, 0)}


def test_ngram_decontamination_catalog_entry_matches_oracle(spark):
    """Driver-style side-by-side for the new entry at sf0.001."""
    import duckdb

    from conftest import SF_SMOKE
    from sparksearch.catalog_pipeline import build_pipeline_catalog

    sf0001_dir = str(SF_SMOKE)
    spec = build_pipeline_catalog()["ngram_decontamination"]
    srows = sorted(
        (r["doc_id"], r["n_windows"], r["dirty_windows"],
         round(r["dirty_frac"], 6))
        for r in spec.fn(spark, sf0001_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf0001_dir}/documents.parquet')"
    )
    drows = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(spec.sql).fetchall()
    )
    assert srows == drows and len(srows) > 10
    # the synthetic corpus plants cross-doc duplication — some must be dirty
    assert any(r[2] > 0 for r in srows)


def test_stratified_sample_matches_brute_force(spark):
    from sparksearch.sampling import stratified_sample

    rows = [(i, f"doc {i}", "en" if i % 3 else "fr") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = [
        (r.lang, r.rank, r.doc_id)
        for r in stratified_sample(docs, per_stratum=5, n_salt=4).collect()
    ]
    want = []
    for lang in ("en", "fr"):
        ids = sorted(
            (i for i, _, lg in rows if lg == lang),
            key=lambda i: (_h60_py(str(i)), i),
        )[:5]
        want += [(lang, rk + 1, i) for rk, i in enumerate(ids)]
    assert sorted(got) == sorted(want)
    # exact quotas
    from collections import Counter

    assert Counter(lang for lang, _, _ in got) == {"en": 5, "fr": 5}


def test_curate_corpus_job_deterministic(spark, tmp_path):
    """The spark-submit curation composition: gate → dedup → splits manifest.
    Re-running produces an identical manifest (invariant #1), every kept doc
    passed the gate, and survivors are unique per content hash."""
    import jobs.curate_corpus as cc

    sf = "/root/testdata/sf0.001"
    s1 = cc.curate(spark, sf, str(tmp_path / "a"))
    s2 = cc.curate(spark, sf, str(tmp_path / "b"))
    assert s1["kept_docs"] == s2["kept_docs"] > 0
    assert s1["by_split_lang"] == s2["by_split_lang"]
    a = spark.read.parquet(s1["manifest"])
    b = spark.read.parquet(s2["manifest"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == a.select("doc_id").distinct().count()


def test_lang_mixture_weights_matches_numpy(spark, docs_sf0001):
    import math

    from sparksearch.sampling import lang_mixture_weights

    got = {r.lang: r for r in lang_mixture_weights(docs_sf0001).collect()}
    # independent token recount (the pinned tokenizer, in Python)
    import re

    pdf = docs_sf0001.toPandas()
    counts: dict[str, int] = {}
    for lang, text in zip(pdf["lang"], pdf["text"]):
        counts[lang] = counts.get(lang, 0) + len(
            re.findall(r"[a-z0-9_]+", str(text).lower())
        )
    total = sum(counts.values())
    qs = {
        lang: round(math.sqrt(c / total), 9) for lang, c in counts.items()
    }
    z = sum(qs.values())
    assert set(got) == set(counts)
    for lang, c in counts.items():
        r = got[lang]
        assert r.n_tokens == c
        assert math.isclose(r.p, c / total, rel_tol=0, abs_tol=5e-7)
        assert math.isclose(r.weight, qs[lang] / z, rel_tol=0, abs_tol=5e-7)
    # weights are a distribution and compress the head: the largest lang's
    # weight share is strictly below its probability share
    big = max(counts, key=lambda k: counts[k])
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-5
    assert got[big].weight < got[big].p
