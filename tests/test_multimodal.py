"""Multimodal binary-column plumbing: metadata, feature extraction through
mapInPandas (Arrow binary batches), the strided frame-sample pattern, and the
decode stub's NotImplementedError gate."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pytest

from sparksearch.multimodal import (
    byte_histogram,
    decode_payload,
    frame_sample,
    payload_meta,
    with_binary_payload,
)


def test_payload_column_is_binary(spark, docs_sf0001):
    b = with_binary_payload(docs_sf0001)
    assert dict(b.dtypes)["payload"] == "binary"
    row = b.orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.n_bytes == len(row.payload)


def test_payload_meta_matches_hashlib(spark, docs_sf0001):
    pdf = docs_sf0001.toPandas().set_index("doc_id")
    for r in payload_meta(docs_sf0001).collect():
        raw = pdf.loc[r.doc_id, "text"].encode()
        assert r.payload_sha256 == hashlib.sha256(raw).hexdigest()
        assert r.n_bytes == len(raw)
        assert r.head_hex == raw[:8].hex()


def test_byte_histogram_reference(spark, docs_sf0001):
    got = {}
    for r in byte_histogram(docs_sf0001).collect():
        got.setdefault(r.doc_id, {})[r.bin] = r.n
    pdf = docs_sf0001.toPandas()
    for row in pdf.head(5).itertuples():
        expected = Counter(b % 16 for b in row.text.encode())
        assert got[int(row.doc_id)] == dict(expected)


def test_decode_stub_gates_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_payload(np.zeros(4, dtype=np.uint8), "image/png", deterministic_fake=False)


def test_frame_sample_reference(spark, docs_sf0001):
    got = {}
    for r in frame_sample(docs_sf0001).collect():
        got.setdefault(r.doc_id, {})[r.frame_idx] = r.frame_val
    pdf = docs_sf0001.toPandas()
    for row in pdf.head(5).itertuples():
        raw = row.text.encode()
        n = min(8, (len(raw) - 1) // 7 + 1)
        expected = {i: raw[i * 7] for i in range(n)}
        assert got[int(row.doc_id)] == expected
