"""Dedup + text-analysis operators vs independent Python references.

The DuckDB driver oracle checks these end-to-end at sf0.01; here we pin the
algorithms against from-scratch NumPy/stdlib implementations (different code
path from both engines) and cover edge cases the fixtures don't have."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from sparksearch.textpipe import (
    doc_fingerprints,
    exact_dedup,
    lang_id,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_signatures,
    text_quality,
    token_counts,
)


def _tok(text: str) -> list[str]:
    return re.findall(r"[a-z0-9_]+", text.lower())


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, k: int = 3) -> set[str]:
    t = _tok(text)
    if len(t) < k:
        return {"|".join(t)}
    return {"|".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def _brute_jaccard_pairs(pdf, threshold=0.8):
    sh = {int(r.doc_id): _shingles(r.text) for r in pdf.itertuples()}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= threshold:
                    out[(a, b)] = j
    return out


def test_exact_dedup_groups(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y"), (7, "a b c")],
        "doc_id long, text string",
    )
    rows = {r.content_sha256: r for r in exact_dedup(docs).collect()}
    h = hashlib.sha256(b"a b c").hexdigest()
    assert rows[h].n_copies == 3 and rows[h].keep_doc_id == 1
    assert rows[hashlib.sha256(b"x y").hexdigest()].n_copies == 1


def test_lsh_equals_brute_force(spark, docs_sf0001, docs_pandas_sf001):
    # sf0.001: LSH candidate generation must not lose a single true pair.
    pdf = docs_sf0001.toPandas()
    expected = _brute_jaccard_pairs(pdf)
    lsh = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in minhash_lsh_dedup(docs_sf0001).collect()
    }
    brute = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs_sf0001).collect()
    }
    assert set(lsh) == set(expected) == set(brute)
    for k, v in expected.items():
        assert abs(lsh[k] - v) < 1e-9 and abs(brute[k] - v) < 1e-9


def test_simhash_matches_reference(spark):
    texts = [(0, "spark query engine query"), (1, "wholly unrelated words here")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    for doc_id, text in texts:
        tf = Counter(_tok(text))
        sig = 0
        for b in range(60):
            w = sum(t if (_h60(term) >> b) & 1 else -t for term, t in tf.items())
            if w > 0:
                sig |= 1 << b
        assert got[doc_id] == sig, doc_id


def test_simhash_dedup_finds_near_identical(spark):
    # One word changed out of 30 → tiny hamming distance; chunk join must
    # surface the pair, and an unrelated doc must not pair with either.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base.replace("zeta", "zetb", 1)),
            (2, "totally different content about ships and harbors and tides"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_id_a, r.doc_id_b) for r in simhash_dedup(docs, max_hamming=10).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_fingerprints_match_reference(spark, docs_sf0001):
    got = {}
    for r in doc_fingerprints(docs_sf0001).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    pdf = docs_sf0001.toPandas()
    for row in pdf.head(10).itertuples():
        t = _tok(row.text)
        khs = [_h60("|".join(t[i : i + 5])) for i in range(len(t) - 4)] or [_h60("|".join(t))]
        if len(khs) >= 4:
            fps = {min(khs[j : j + 4]) for j in range(len(khs) - 3)}
        else:
            fps = {min(khs)}
        assert got[int(row.doc_id)] == fps, row.doc_id


def test_lang_id_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is happy"),
            (1, "der hund ist nicht mit der katze"),
            (2, "le chat est dans la maison et les jardins"),
            (3, "xylophone zebra quartz"),  # all-zero → tiebreak → en
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.predicted_lang for r in lang_id(docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "en"}


def test_token_counts_reference(spark):
    docs = spark.createDataFrame(
        [(0, "Hello, World! foo_bar baz123 x")], "doc_id long, text string"
    )
    r = token_counts(docs).collect()[0]
    words = _tok("Hello, World! foo_bar baz123 x")
    assert r.n_word_tokens == len(words) == 5
    assert r.n_ws_tokens == 5
    assert r.n_subword_est == sum(-(-len(w) // 4) for w in words)


def test_text_quality_components(spark):
    docs = spark.createDataFrame(
        [(0, "the " * 50 + "cat")], "doc_id long, text string"
    )
    r = text_quality(docs).collect()[0]
    assert r.n_tokens == 51
    assert r.stopword_ratio == pytest.approx(50 / 51, abs=1e-6)
    # 51 tokens (len ≥ 100 → 0.4·0.51), mean len ≈ 3, stopword-saturated
    assert 0 < r.quality_score <= 1


def test_dataset_splits_deterministic_and_complete(spark, docs_sf0001):
    from sparksearch.sampling import dataset_splits, split_contamination

    a = {(r.lang, r.split): r.n_docs for r in dataset_splits(docs_sf0001).collect()}
    b = {(r.lang, r.split): r.n_docs for r in dataset_splits(docs_sf0001).collect()}
    assert a == b  # rebuild-identical (no rand())
    assert sum(a.values()) == docs_sf0001.count()
    assert {s for (_, s) in a} <= {"train", "val", "test"}
    # ~80/10/10 by construction (hash-uniform)
    tot = sum(a.values())
    train = sum(n for (_, s), n in a.items() if s == "train")
    assert 0.6 * tot < train < 0.95 * tot

    # contamination detector: plant an exact duplicate across splits
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(200), "text": [f"doc {i}" for i in range(200)],
                        "lang": ["en"] * 200})
    # make doc 0..199 all unique except two copies of one text
    pdf.loc[1, "text"] = pdf.loc[0, "text"]
    docs = spark.createDataFrame(pdf)
    from sparksearch.sampling import split_name_col
    splits = {r.doc_id: r.s for r in docs.select("doc_id", split_name_col().alias("s")).collect()}
    got = {(r.split_a, r.split_b): r.n_pairs for r in split_contamination(docs).collect()}
    if splits[0] == splits[1]:
        assert got == {}  # same split → not contamination
    else:
        assert got == {(min(splits[0], splits[1]), max(splits[0], splits[1])): 1}


def test_minhash_signatures_match_reference(spark):
    """Pins the public minhash_signatures/minhash_sig_col API against a
    from-scratch Python MinHash (same h60 seed|shingle formula) — these feed
    lsh_band_keys' semantics and must never drift."""
    from sparksearch.textpipe import doc_shingle_arrays, minhash_signatures

    texts = [(0, "a b c d e f"), (1, "x y z a b c")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in minhash_signatures(doc_shingle_arrays(docs), n_hashes=8).collect():
        got.setdefault(r.doc_id, {})[r.seed] = r.minh
    for doc_id, text in texts:
        sh = _shingles(text)
        for seed in range(8):
            assert got[doc_id][seed] == min(_h60(f"{seed}|{s}") for s in sh)


def test_lsh_band_keys_partial_band(spark):
    """Non-divisible n_hashes: the trailing seeds form a partial band (no
    seed silently dropped) — mirrors the oracle's seed // rows_per_band."""
    from sparksearch.textpipe import doc_shingle_arrays, lsh_band_keys

    docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    rows = lsh_band_keys(doc_shingle_arrays(docs), n_hashes=7, rows_per_band=3).collect()
    assert sorted(r.band for r in rows) == [0, 1, 2]  # 3+3+1 seeds
    sh = _shingles("a b c d e")
    mins = [min(_h60(f"{seed}|{s}") for s in sh) for seed in range(7)]
    expect = {
        0: _h60(",".join(map(str, mins[0:3]))),
        1: _h60(",".join(map(str, mins[3:6]))),
        2: _h60(",".join(map(str, mins[6:7]))),
    }
    assert {r.band: r.bkey for r in rows} == expect


def test_term_cooccurrence_pmi_hand(spark):
    """3-doc corpus with known document frequencies: PMI values and the
    round-then-tiebreak ranking checked against hand math."""
    import math

    from sparksearch.textpipe import term_cooccurrence

    docs = spark.createDataFrame(
        [(0, "apple banana"), (1, "apple banana cherry"), (2, "apple date")],
        "doc_id long, text string",
    )
    rows = term_cooccurrence(docs, top_v=10, k=10).collect()
    got = {(r.term_a, r.term_b): (r.rank, r.n_both, r.pmi) for r in rows}
    # df: apple 3, banana 2, cherry 1, date 1; N = 3
    want_pmi = {
        ("apple", "banana"): (2, 2 * 3 / (3 * 2)),   # ln(1) = 0
        ("apple", "cherry"): (1, 1 * 3 / (3 * 1)),   # ln(1) = 0
        ("apple", "date"): (1, 1 * 3 / (3 * 1)),     # ln(1) = 0
        ("banana", "cherry"): (1, 1 * 3 / (2 * 1)),  # ln(1.5) > 0
    }
    assert set(got) == set(want_pmi)
    for pair, (n, ratio) in want_pmi.items():
        assert got[pair][1] == n
        assert got[pair][2] == pytest.approx(round(math.log(ratio), 6))
    # banana-cherry has the highest PMI → rank 1; the ln(1)=0 ties order
    # lexicographically by (term_a, term_b).
    ranked = sorted(got.items(), key=lambda kv: kv[1][0])
    assert [p for p, _ in ranked] == [
        ("banana", "cherry"), ("apple", "banana"),
        ("apple", "cherry"), ("apple", "date"),
    ]


def test_training_data_stats_gauntlet(spark):
    """Exact duplicates collapse to one survivor; sub-threshold docs are
    gated out; split/lang grouping keys are respected."""
    from sparksearch.sampling import split_name_col, training_data_stats
    from sparksearch.textpipe import text_quality

    good = ("the fast key order sort table scan merge part window small "
            "hash scan join order batch the of to and in is it on for a")
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, good, "en"),        # exact dups → one survivor
         (3, "zz", "en"),                          # low quality → gated
         (4, good + " extra tokens here", "de")],
        "doc_id long, text string, lang string",
    )
    q = {r.doc_id: r.quality_score for r in text_quality(docs).collect()}
    assert q[1] >= 0.5 and q[3] < 0.5
    splits = {r.doc_id: r.s for r in docs.select(
        "doc_id", split_name_col().alias("s")).collect()}
    out = {(r.split, r.lang): (r.n_docs, r.n_tokens, r.avg_quality)
           for r in training_data_stats(docs).collect()}
    # doc 2 (dup of 1) and doc 3 (low quality) never appear; survivors are
    # doc 1 and doc 4 under their own (split, lang) cells.
    assert sum(n for n, _, _ in out.values()) == 2
    assert (splits[1], "en") in out and (splits[4], "de") in out


def test_keyword_extraction_hand_math(spark):
    import math

    from sparksearch.stats import corpus_stats
    from sparksearch.textpipe import keyword_extraction

    docs = spark.createDataFrame(
        [(0, "rare common common"), (1, "common common common")],
        "doc_id long, text string",
    )
    tf_df, _, ts, _ = corpus_stats(docs)
    out = {
        (r.doc_id, r.rank): (r.term, r.tfidf)
        for r in keyword_extraction(tf_df, ts, topn=2).collect()
    }
    idf_rare = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))    # df=1, N=2
    idf_common = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))  # df=2
    assert out[(0, 1)] == ("rare", round(1 * idf_rare, 6))
    assert out[(0, 2)] == ("common", round(2 * idf_common, 6))
    assert out[(1, 1)] == ("common", round(3 * idf_common, 6))


def test_unigram_xent_hand_math(spark):
    import math

    from sparksearch.stats import corpus_stats
    from sparksearch.textpipe import unigram_xent

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b c")],
        "doc_id long, text string",
    )
    tf_df, _, ts, _ = corpus_stats(docs)
    out = {r.doc_id: r.xent for r in unigram_xent(tf_df, ts).collect()}
    C = 7.0
    lp = {t: round(math.log(cf / C), 9) for t, cf in {"a": 3, "b": 3, "c": 1}.items()}
    exp0 = round(-(2 * lp["a"] + 1 * lp["b"]) / 3, 6)
    exp1 = round(-(1 * lp["a"] + 2 * lp["b"] + 1 * lp["c"]) / 4, 6)
    assert out == {0: exp0, 1: exp1}
    # the common-only doc is closer to the corpus LM than the one with the
    # rare term
    assert out[0] < out[1]


def test_ngram_repetition_hand_math(spark):
    from sparksearch.textpipe import ngram_repetition

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),   # 7 grams: abc,bca,cab,abc,bca,cab,abc -> 3 distinct
            (1, "a b c d e"),           # 3 grams, all distinct
            (2, "a b"),                 # < k tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_grams, r.dup_frac) for r in ngram_repetition(docs).collect()}
    assert out[0] == (7, round(4 / 7, 6))
    assert out[1] == (3, 0.0)
    assert out[2] == (0, 0.0)


def test_dsir_log_weights_hand_math(spark):
    import math

    from sparksearch.sampling import dsir_log_weights
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(0, "a a b", "en"), (1, "b c", "de"), (2, "a c c", "en")],
        "doc_id long, text string, lang string",
    )
    tf_df, _, ts, _ = corpus_stats(docs)
    out = {r.doc_id: r.logw for r in dsir_log_weights(tf_df, docs, ts).collect()}
    cf = {"a": 3, "b": 2, "c": 3}          # source counts, C_src=8, V=3
    cf_t = {"a": 3, "b": 1, "c": 2}        # target (en) counts, C_tgt=6
    lr = {
        t: round(
            math.log((cf_t[t] + 1) / (6 + 3)) - math.log((cf[t] + 1) / (8 + 3)), 9
        )
        for t in cf
    }
    tfs = {0: {"a": 2, "b": 1}, 1: {"b": 1, "c": 1}, 2: {"a": 1, "c": 2}}
    exp = {
        d: round(sum(n * lr[t] for t, n in terms.items()), 6)
        for d, terms in tfs.items()
    }
    assert out == exp
    # the pure-target-looking docs outscore the out-of-domain one
    assert out[1] < out[0] and out[1] < out[2]


def test_exact_substring_spans_hand_math(spark):
    """ExactSubstr semantics on a constructed corpus: a 10-token run shared
    by two docs (k=4 windows all duplicated), a self-repeated run inside a
    third doc, and a unique doc that must not appear. Span merging is
    closed-interval union (overlap OR adjacency)."""
    from sparksearch.textpipe import exact_substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, shared + " one two three"),                    # 13 tokens
            (2, "x y " + shared),                              # 12 tokens
            (3, "p q r s p q r s p q r s zz"),                 # self-repeat
            (4, "unique tokens only here nothing repeats ever at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"],
                      r["dup_fraction"])
        for r in exact_substring_spans(docs, k=4).collect()
    }
    # docs 1+2: every 4-window of the shared 10-token run occurs twice →
    # one maximal span of exactly those 10 tokens in each doc
    assert out[1] == (13, 1, 10, round(10 / 13, 6))
    assert out[2] == (12, 1, 10, round(10 / 12, 6))
    # doc 3: "p q r s" repeats 3x → windows at starts 1..9 all duplicated
    # (each 4-gram of the periodic region recurs 4 positions later) →
    # one span covering tokens 1..12
    assert out[3] == (13, 1, 12, round(12 / 13, 6))
    assert 4 not in out


def test_exact_substring_spans_split_and_short_docs(spark):
    from sparksearch.textpipe import exact_substring_spans

    run_a = "a1 a2 a3 a4 a5"
    run_b = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [
            # two duplicated runs separated by >1 unique token → TWO spans
            (1, run_a + " u1 u2 u3 " + run_b),
            (2, run_a + " v1 v2 v3 " + run_b),
            (3, "tiny doc"),  # < k tokens: no windows, never emitted
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in exact_substring_spans(docs, k=4).collect()
    }
    assert out[1] == (2, 10) and out[2] == (2, 10)
    assert 3 not in out


def test_exact_substring_catalog_entry_matches_oracle(spark):
    """Driver-style side-by-side for the new entry at sf0.001."""
    import duckdb

    from conftest import SF_SMOKE
    from sparksearch.catalog_pipeline import build_pipeline_catalog

    sf0001_dir = str(SF_SMOKE)
    spec = build_pipeline_catalog()["dedup_exact_substring"]
    srows = sorted(
        (r["doc_id"], r["n_tokens"], r["n_dup_spans"], r["dup_tokens"],
         round(r["dup_fraction"], 6))
        for r in spec.fn(spark, sf0001_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf0001_dir}/documents.parquet')"
    )
    drows = sorted(
        (r[0], r[1], r[2], r[3], round(r[4], 6))
        for r in con.execute(spec.sql).fetchall()
    )
    assert srows == drows and len(srows) > 10


# ------------------------------------------------- Gopher rules / bigram LM


def test_gopher_rules_hand_cases(spark):
    from sparksearch.textpipe import gopher_rules

    good = (
        "the quick brown foxes jumped over the lazy dogs while the other "
        "animals watched from their comfortable houses in the quiet forest"
    )  # 21 tokens, stopword hits >= 2, mean token length ~4.9 (in [3, 10])
    docs = spark.createDataFrame(
        [
            (0, good, "en"),
            (1, "tiny doc", "en"),                      # 2 tokens < floor
            (2, "- a\n- b\n- c\n- d", "en"),            # 100% bullet lines
            (3, good + " " + "#" * 40, "en"),           # symbol ratio >> 0.1
            (4, "12 34 56 78 90 11 22 33 44 55 66", "en"),  # no alpha chars
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.asDict() for r in gopher_rules(docs).collect()}
    assert out[0]["passes"] == 1
    assert all(v == 1 for k, v in out[0].items() if k.startswith("flag_"))
    assert out[1]["flag_wordcount"] == 0 and out[1]["passes"] == 0
    assert out[2]["flag_bullet"] == 0
    assert out[3]["flag_symbol"] == 0
    assert out[4]["flag_alpha"] == 0 and out[4]["flag_stopwords"] == 0


def test_gopher_rules_zero_token_doc_fails_closed(spark):
    from sparksearch.textpipe import gopher_rules

    docs = spark.createDataFrame(
        [(0, "!!! ??? ...", "en")], "doc_id long, text string, lang string"
    )
    row = gopher_rules(docs).collect()[0]
    assert row.n_tokens == 0
    # NULL ratios must fail closed (flag 0), not crash or pass
    assert row.passes == 0 and row.flag_meanlen == 0 and row.flag_alpha == 0


def test_bigram_xent_hand_math(spark):
    import math

    from sparksearch.stats import corpus_stats
    from sparksearch.textpipe import bigram_xent

    docs = spark.createDataFrame(
        [(0, "a b a b", "en"), (1, "a b", "en"), (2, "c", "en")],
        "doc_id long, text string, lang string",
    )
    _, _, ts, _ = corpus_stats(docs)
    out = {r.doc_id: (r.n_bigrams, r.xent) for r in bigram_xent(docs, ts).collect()}
    # V=3; c(a|b)=3, c(b|a)=1; c(a.)=3+1=4? no: left-marginal of 'a' spans
    # both bigram types starting with a: c(a|b)=3 -> cw(a)=3; cw(b)=1.
    lp_ab = round(math.log((3 + 1) / (3 + 3)), 9)
    lp_ba = round(math.log((1 + 1) / (1 + 3)), 9)
    assert out[0][0] == 3
    assert out[0][1] == pytest.approx(-(2 * lp_ab + lp_ba) / 3, abs=2e-6)
    assert out[1] == (1, pytest.approx(-lp_ab, abs=2e-6))
    assert 2 not in out  # single-token doc: no bigrams, no row


def test_kmv_matches_brute_force(spark):
    import hashlib

    from sparksearch.textpipe import kmv_distinct_terms

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = [
        (i, " ".join(f"w{j}" for j in range(i % 7 + 1)) + f" only{i % 3}", "en" if i % 2 else "de")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in kmv_distinct_terms(docs, k=4, n_salt=4).collect()}
    import re

    for lang in ("en", "de"):
        vocab = set()
        for i, text, lg in rows:
            if lg == lang:
                vocab.update(re.findall(r"[a-z0-9_]+", text.lower()))
        hs = sorted({h60(t) for t in vocab})
        r = out[lang]
        assert r.n_exact == len(hs)
        assert r.n_sketch == min(4, len(hs))
        assert r.kth_hash == hs[: 4][-1]
        want = (
            float(r.n_sketch) if r.n_sketch < 4
            else 3.0 / (hs[3] / float(1 << 60))
        )
        assert r.est_distinct == pytest.approx(want, abs=1e-6)


def test_line_boilerplate_hand_case(spark):
    from sparksearch.textpipe import line_boilerplate

    banner = "licensed under the apache license"
    docs = spark.createDataFrame(
        [
            (0, banner + "\nunique zero\nalso zero", "en"),
            (1, banner + "\nunique one", "en"),
            (2, banner + "\n\n  \nunique two", "en"),   # blank lines dropped
            (3, "nothing shared here", "en"),
            (4, "", "en"),                              # no non-empty lines: no row
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in line_boilerplate(docs, min_docs=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert (out[0].n_lines, out[0].n_boiler) == (3, 1)
    assert (out[1].n_lines, out[1].n_boiler) == (2, 1)
    assert (out[2].n_lines, out[2].n_boiler) == (2, 1)  # blanks not counted
    assert (out[3].n_lines, out[3].n_boiler) == (1, 0)
    assert out[1].boiler_frac == pytest.approx(0.5)
    # trim-insensitivity: the same banner with leading spaces still matches
    docs2 = spark.createDataFrame(
        [(0, "  " + banner, "en"), (1, banner, "en"), (2, banner + " ", "en")],
        "doc_id long, text string, lang string",
    )
    out2 = {r.doc_id: r.n_boiler for r in line_boilerplate(docs2, min_docs=3).collect()}
    assert out2 == {0: 1, 1: 1, 2: 1}


# ------------------------------------------- content-defined chunking (CDC)


def _cdc_oracle(text: str, w: int = 16, d: int = 64):
    """From-scratch chunker: position-local h60 boundary rule."""
    L = len(text)
    cuts = [
        i + w - 1
        for i in range(1, L - w + 2)
        if _h60(text[i - 1 : i - 1 + w]) % d == 0 and i + w - 1 < L
    ]
    ends = cuts + [L]
    out, start = [], 1
    for idx, e in enumerate(ends, 1):
        chunk = text[start - 1 : e]
        out.append((idx, start, e - start + 1, _h60(chunk)))
        start = e + 1
    return out


def test_cdc_chunks_matches_oracle_and_tiles(spark):
    from sparksearch.textpipe import cdc_chunks

    texts = [
        "".join(f"tok{i} flow batch spark merge " for i in range(40)),
        "short one",
        "x" * 16,
        "y" * 15,  # below window width → single chunk
        "the fast key order sort table scan merge part window " * 9,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_h60"])
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _cdc_oracle(t), i
        # chunks tile the document exactly: contiguous, full coverage
        chunks = sorted(got[i])
        assert chunks[0][1] == 1
        assert sum(c[2] for c in chunks) == len(t)
        for a, b in zip(chunks, chunks[1:]):
            assert b[1] == a[1] + a[2]


def test_cdc_chunks_resync_after_prefix_insertion(spark):
    """The CDC property exact fixed-size chunking lacks: an insertion shifts
    offsets but boundaries re-synchronize, so later chunk hashes survive."""
    from sparksearch.textpipe import cdc_chunks

    base = "".join(f"tok{i} flow batch spark merge " for i in range(40))
    docs = spark.createDataFrame(
        [(0, base), (1, "INSERTED PREFIX " + base)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs).collect()
    h0 = {r["chunk_h60"] for r in rows if r["doc_id"] == 0}
    h1 = {r["chunk_h60"] for r in rows if r["doc_id"] == 1}
    assert len(h0) > 2  # the base doc actually chunks
    # every post-resync chunk is shared; only the O(1) head chunks differ
    assert len(h0 & h1) >= len(h0) - 2


def test_xent_buckets_balanced_and_monotone(spark):
    from sparksearch.queries_catalog import _stats_for
    from sparksearch.textpipe import xent_buckets

    tf_df, _, ts, _ = _stats_for(spark, "/root/testdata/sf0.001")
    rows = xent_buckets(tf_df, ts).collect()
    sizes = Counter(r["bucket"] for r in rows)
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE quotas
    # tiers are ordered: every head xent ≤ every tail xent
    assert max(r["xent"] for r in rows if r["bucket"] == 1) <= min(
        r["xent"] for r in rows if r["bucket"] == 3
    )


def test_zipf_fit_matches_numpy_lstsq(spark):
    import numpy as np

    from sparksearch.queries_catalog import _stats_for
    from sparksearch.stats import zipf_fit

    _, _, ts, _ = _stats_for(spark, "/root/testdata/sf0.001")
    row = zipf_fit(ts).collect()[0]
    pts = sorted(
        ((r["cf"], r["term"]) for r in ts.select("term", "cf").collect()),
        key=lambda t: (-t[0], t[1]),
    )
    x = np.log(np.arange(1, len(pts) + 1, dtype=float))
    y = np.log(np.array([c for c, _ in pts], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row["n_terms"] == len(pts)
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    assert row["slope"] < 0  # frequency falls with rank


def test_heaps_fit_matches_numpy_lstsq(spark):
    import numpy as np

    from sparksearch.queries_catalog import _stats_for
    from sparksearch.stats import heaps_fit

    tf_df, dl_df, _, _ = _stats_for(spark, "/root/testdata/sf0.001")
    row = heaps_fit(tf_df, dl_df).collect()[0]
    # from-scratch growth curve
    firsts: dict = {}
    for r in tf_df.select("term", "doc_id").collect():
        t = r["term"]
        if t not in firsts or r["doc_id"] < firsts[t]:
            firsts[t] = r["doc_id"]
    dls = sorted((r["doc_id"], r["dl"]) for r in dl_df.collect())
    new_per_doc = Counter(firsts.values())
    cum_t, cum_v, xs, ys = 0, 0, [], []
    for d, dl in dls:
        cum_t += dl
        cum_v += new_per_doc.get(d, 0)
        xs.append(cum_t)
        ys.append(cum_v)
    import numpy as np

    slope, intercept = np.polyfit(np.log(xs), np.log(ys), 1)
    assert row["n_points"] == len(dls)
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    # vocabulary growth is sublinear but real: 0 < beta < 1
    assert 0.0 < row["slope"] < 1.0


def test_cdc_chunk_dedup_flags_shared_chunks(spark):
    from sparksearch.textpipe import cdc_chunk_dedup

    shared = "".join(f"tok{i} flow batch spark merge " for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, shared),
            (1, "PREFIX DIFFERS here " + shared),  # shares post-resync chunks
            (2, "completely different content that no other document has xyz"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in cdc_chunk_dedup(docs).collect()}
    assert set(got) == {0, 1, 2}
    # the shared pair: most chunks duplicated; frac consistent with counts
    for d in (0, 1):
        r = got[d]
        assert r["n_dup_chunks"] >= r["n_chunks"] - 2 > 0
        assert r["dup_chunk_frac"] == round(r["n_dup_chunks"] / r["n_chunks"], 6)
        assert r["dup_len"] > 0
    # the unique doc: nothing shared
    assert got[2]["n_dup_chunks"] == 0 and got[2]["dup_len"] == 0
    assert got[2]["dup_chunk_frac"] == 0.0


def test_pii_scan_hand_case(spark):
    from sparksearch.textpipe import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "contact Bob.Smith+x@mail-host.example.org today"),
            (2, "server at 10.0.255.7 and 192.168.1.1 port 8080"),
            (3, "clean text with one 7 digit"),      # \d{2,} needs >= 2
            (4, "ids 1234 and 42 and code_99"),
            (5, "no pii here at all"),
            (6, None),  # NULL text scans as empty, never -1 counts
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scan(docs, "doc_id", "text").collect()}
    assert got[6].n_emails == 0 and got[6].n_numbers == 0 and got[6].has_pii == 0
    assert got[1].n_emails == 1 and got[1].has_pii == 1
    assert got[2].n_ipv4 == 2
    # the IPs' digit runs also count as number hits (2-digit+ runs)
    assert got[2].n_numbers >= 3 and got[2].has_pii == 1
    assert got[3].n_emails == got[3].n_ipv4 == 0
    assert got[3].n_numbers == 0 and got[3].has_pii == 0
    assert got[4].n_numbers == 3 and got[4].n_ipv4 == 0
    assert got[5].has_pii == 0


def test_term_adjacency_matrix_hand_case(spark):
    from sparksearch.textpipe import term_adjacency_matrix

    docs = spark.createDataFrame(
        [
            (1, "query window scan"),   # all three
            (2, "query window"),
            (3, "query query other"),   # dedup within doc
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.key_a, r.key_b): r.n_docs
        for r in term_adjacency_matrix(docs).collect()
    }
    assert got[("q_query", "q_query")] == 3
    assert got[("w_window", "w_window")] == 2
    assert got[("s_scan", "s_scan")] == 1
    assert got[("q_query", "w_window")] == 2
    assert got[("q_query", "s_scan")] == 1
    assert got[("s_scan", "w_window")] == 1
    # ES semantics: empty intersections omitted, a<=b ordering only
    assert len(got) == 6


def test_term_triangles_hand_case(spark):
    from sparksearch.textpipe import term_triangles

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc"),      # triangle aa-bb-cc
            (2, "aa dd"),         # pendant edge -> no triangle for dd
            (3, "aa bb"),         # reinforces an edge, adds no triangle
        ],
        "doc_id long, text string",
    )
    got = {r.term: r.n_triangles for r in term_triangles(docs).collect()}
    assert got == {"aa": 1, "bb": 1, "cc": 1, "dd": 0}


def test_term_triangles_k4_counts(spark):
    # complete graph on 4 terms: C(4,3)=4 triangles, each node in 3
    from sparksearch.textpipe import term_triangles

    docs = spark.createDataFrame(
        [(1, "p q r s")], "doc_id long, text string"
    )
    got = {r.term: r.n_triangles for r in term_triangles(docs).collect()}
    assert got == {"p": 3, "q": 3, "r": 3, "s": 3}


def test_lang_token_fertility_hand_case(spark):
    from sparksearch.textpipe import lang_token_fertility

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", len("one two three")),
            (2, "four five", "en", len("four five")),
            (3, "un deux", "fr", len("un deux")),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {r.lang: r for r in lang_token_fertility(docs).collect()}
    en, fr = got["en"], got["fr"]
    assert (en.n_docs, en.n_tokens, en.n_chars) == (2, 5, 22)
    assert en.chars_per_token == round(22 / 5, 6)
    assert en.tokens_per_doc == 2.5
    assert (fr.n_docs, fr.n_tokens) == (1, 2)


def test_string_stats_matches_numpy(spark, docs_sf0001):
    import math
    from collections import Counter

    from sparksearch.textpipe import doc_string_stats

    got = {r.lang: r for r in doc_string_stats(docs_sf0001).collect()}
    pdf = docs_sf0001.toPandas()
    for lang, grp in pdf.groupby("lang"):
        lens = grp.text.map(len)
        r = got[lang]
        assert r.n_docs == len(grp)
        assert (r.min_len, r.max_len) == (lens.min(), lens.max())
        assert math.isclose(r.avg_len, lens.sum() / len(grp), abs_tol=5e-7)
        cnt = Counter("".join(grp.text))
        t = sum(cnt.values())
        h = -sum(c / t * math.log2(c / t) for c in cnt.values())
        # 9-dp ln quantization keeps the engine value within ~1e-6 of exact
        assert math.isclose(r.entropy, h, abs_tol=2e-5)


def test_terms_shard_error_bound_and_mirror(spark, docs_sf0001):
    import hashlib

    from sparksearch.build import tokenize_tf
    from sparksearch.textpipe import (
        TERMS_ERR_NSHARDS,
        TERMS_ERR_SHARD_K,
        TERMS_ERR_TOPN,
        terms_shard_error,
    )

    tf_df = tokenize_tf(docs_sf0001.select("doc_id", "text")).select(
        "term", "doc_id", "tf", "dl"
    )
    rows = sorted(terms_shard_error(tf_df).collect(), key=lambda r: r.rank)
    assert 0 < len(rows) <= TERMS_ERR_TOPN

    # ES invariant: est <= exact <= est + doc_count_error_upper_bound
    for r in rows:
        assert r.est_df <= r.exact_df <= r.est_df + r.err_bound

    # brute-force mirror of the shard simulation
    pdf = tf_df.select("term", "doc_id").toPandas()
    h = pdf.doc_id.map(
        lambda d: int(hashlib.md5(f"shard|{d}".encode()).hexdigest()[:15], 16)
        % TERMS_ERR_NSHARDS
    )
    per = pdf.assign(shard=h).groupby(["shard", "term"]).size()
    kept, kth = {}, {}
    for s in sorted(per.index.get_level_values(0).unique()):
        sl = per.loc[s].sort_index().sort_values(ascending=False, kind="stable")
        order = sorted(sl.items(), key=lambda t: (-t[1], t[0]))[:TERMS_ERR_SHARD_K]
        kept[s] = dict(order)
        kth[s] = order[-1][1] if len(order) == TERMS_ERR_SHARD_K else 0
    cands = {t for d in kept.values() for t in d}
    est = {t: sum(kept[s].get(t, 0) for s in kept) for t in cands}
    err = {t: sum(kth[s] for s in kept if t not in kept[s]) for t in cands}
    want = sorted(est.items(), key=lambda t: (-t[1], t[0]))[: TERMS_ERR_TOPN]
    assert [(r.term, r.est_df, r.err_bound) for r in rows] == [
        (t, e, err[t]) for t, e in want
    ]
