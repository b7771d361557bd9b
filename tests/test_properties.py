"""Hypothesis property tests — adversarial inputs the fixtures never produce
(SURVEY.md §5.2's property layer, widened in round 2).

Driver-side only (no Spark): the properties pin the pure kernels that the
distributed operators are built from — the codec, the phrase matcher's
adjacency rule, the SimHash pigeonhole bound, and the tokenizer twins."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparksearch.codec import encode_sublist, varint_decode, varint_encode
from sparksearch.tokenize import py_tokenize, py_tokenize_code

# --------------------------------------------------------------------- codec


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
def test_varint_roundtrip_property(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**40),  # doc gap
            st.integers(min_value=1, max_value=1000),   # tf
            st.integers(min_value=1, max_value=5000),   # dl
        ),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=64),  # block size
)
def test_block_roundtrip_property(postings, block_size):
    gaps = np.array([g for g, _, _ in postings], dtype=np.int64)
    ids = np.cumsum(gaps)
    tfs = np.array([t for _, t, _ in postings], dtype=np.uint64)
    dls = np.array([d for _, _, d in postings], dtype=np.uint64)
    enc = encode_sublist(ids, tfs, block_size, dls=dls)
    # coverage: block sizes sum to n, bounds nest, decode reproduces input
    assert int(enc["n"].sum()) == ids.size
    out_ids, out_tfs, out_dls = [], [], []
    for first, gaps_b, tfs_b, dls_b, n, last in zip(
        enc["first_doc_id"], enc["doc_gaps"], enc["tfs"], enc["dls"],
        enc["n"], enc["last_doc_id"],
    ):
        g = varint_decode(gaps_b).astype(np.int64)
        block_ids = np.concatenate(([first], first + np.cumsum(g))) if g.size else np.array([first])
        assert block_ids.size == n and block_ids[-1] == last
        out_ids.append(block_ids)
        out_tfs.append(varint_decode(tfs_b))
        out_dls.append(varint_decode(dls_b))
    assert (np.concatenate(out_ids) == ids).all()
    assert (np.concatenate(out_tfs) == tfs).all()
    assert (np.concatenate(out_dls) == dls).all()
    # impact-pair metadata: for ANY positive (idf, avgdl), the bound derived
    # from (max_tf, min_dl) dominates every posting's BM25 contribution in
    # the block — the property WAND exactness rests on (score is monotone
    # ↑tf, ↓dl, so the pair's score is a per-block upper bound).
    bounds = np.concatenate(([0], np.cumsum(enc["n"])))
    k1, b = 1.2, 0.75
    for avgdl in (1.0, 50.0, 5000.0):
        def bm25(tf, dl):
            return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

        for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
            assert enc["max_tf"][i] == tfs[s:e].max()
            assert enc["min_dl"][i] == dls[s:e].min()
            bound = bm25(float(enc["max_tf"][i]), float(enc["min_dl"][i]))
            block_scores = bm25(tfs[s:e].astype(np.float64), dls[s:e].astype(np.float64))
            assert (block_scores <= bound + 1e-12).all()


# ----------------------------------------------------------------- tokenizer

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_tokenizer_is_its_own_fixpoint(text):
    toks = py_tokenize(text)
    assert all(re.fullmatch(r"[a-z0-9_]+", t) for t in toks)
    # re-tokenizing the joined tokens is the identity (canonical form)
    assert py_tokenize(" ".join(toks)) == toks


@settings(max_examples=200, deadline=None)
@given(_text)
def test_code_tokenizer_refines_plain(text):
    # identifier splitting only ever SPLITS (at underscores / camel bounds),
    # never merges across separators and never changes any other character:
    # the code-mode token stream is the plain stream minus underscores.
    plain = py_tokenize(text)
    code = py_tokenize_code(text)
    assert "".join(code) == "".join(plain).replace("_", "")
    assert all(re.fullmatch(r"[a-z0-9]+", t) for t in code)  # no "_" survives


# -------------------------------------------------------------------- phrase


def _phrase_count_positions(token_pos: dict[str, list[int]], terms: list[str]) -> int:
    """The engine's adjacency rule (phrase._phrase_start_positions) in pure
    Python: start positions p with terms[i] at p+i for all i."""
    if any(t not in token_pos for t in terms):
        return 0
    starts = set(token_pos[terms[0]])
    for i, t in enumerate(terms[1:], start=1):
        starts &= {p - i for p in token_pos[t]}
    return len(starts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=30),
    st.lists(st.sampled_from("ab"), min_size=1, max_size=4),
)
def test_phrase_adjacency_rule_equals_naive_scan(doc, phrase):
    token_pos: dict[str, list[int]] = {}
    for i, t in enumerate(doc):
        token_pos.setdefault(t, []).append(i + 1)
    naive = sum(
        1
        for i in range(len(doc) - len(phrase) + 1)
        if doc[i : i + len(phrase)] == phrase
    )
    assert _phrase_count_positions(token_pos, list(phrase)) == naive


# ------------------------------------------------------------------- simhash


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**60 - 1),
    st.sets(st.integers(min_value=0, max_value=59), max_size=3),
    st.integers(min_value=1, max_value=10),
)
def test_simhash_pigeonhole_is_exact(sig, flip_bits, max_hamming):
    """For ANY radius r, cutting 60 bits into r+1 chunks guarantees a pair
    within hamming r agrees on ≥1 whole chunk (the textpipe.simhash_dedup
    bucketing invariant, generalized in round 2)."""
    if len(flip_bits) > max_hamming:
        flip_bits = set(list(flip_bits)[:max_hamming])
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    n_chunks = max_hamming + 1
    bounds = [i * 60 // n_chunks for i in range(n_chunks + 1)]
    agree = False
    for c in range(n_chunks):
        mask = ((1 << (bounds[c + 1] - bounds[c])) - 1) << bounds[c]
        if (sig & mask) == (other & mask):
            agree = True
    assert agree


@given(
    st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=40)
)
@settings(max_examples=300, deadline=None)
def test_funnel_greedy_equals_chained_min(seq):
    """The equivalence relational.events_funnel relies on (and its DuckDB
    oracle implements the other way): the greedy fold over the sorted
    event list reaches the same depth as the nested earliest-completion
    chain of k min-searches. Pure-Python mirror of both algorithms over
    arbitrary step sequences."""
    n_steps = 4
    # greedy fold (the Spark F.aggregate lambda)
    acc = 0
    for s in seq:
        if s == acc:
            acc += 1
    # chained earliest-completion (the oracle's s1..s4 min-joins)
    pos = -1
    depth = 0
    for step in range(n_steps):
        nxt = next(
            (i for i in range(pos + 1, len(seq)) if seq[i] == step), None
        )
        if nxt is None:
            break
        pos = nxt
        depth += 1
    assert acc == depth
