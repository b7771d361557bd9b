"""Codec property tests: decode(encode(x)) == x across edge cases (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from sparksearch.codec import (
    decode_block,
    decode_blocks,
    encode_sublist,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    cases = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([1, 127, 128, 129, 16383, 16384], dtype=np.uint64),
        np.array([2**32 - 1, 2**32, 2**63, 2**64 - 1], dtype=np.uint64),
    ]
    for arr in cases:
        assert (varint_decode(varint_encode(arr)) == arr).all()


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        # mix of magnitudes, heavy on small gaps like real posting lists
        arr = np.concatenate(
            [
                rng.integers(0, 128, 500).astype(np.uint64),
                rng.integers(0, 2**20, 100).astype(np.uint64),
                rng.integers(0, 2**50, 10).astype(np.uint64),
            ]
        )
        rng.shuffle(arr)
        assert (varint_decode(varint_encode(arr)) == arr).all()


def test_varint_truncated_raises():
    buf = varint_encode(np.array([300], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(buf[:-1])


def test_block_roundtrip_random():
    rng = np.random.default_rng(7)
    for n in [1, 2, 127, 128, 129, 1000]:
        ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 200, n).astype(np.int64)
        dls = rng.integers(1, 5000, n).astype(np.int64)
        enc = encode_sublist(ids, tfs, block_size=128, dls=dls)
        got_ids, got_tfs = decode_blocks(enc["first_doc_id"], enc["doc_gaps"], enc["tfs"])
        assert (got_ids == ids).all()
        assert (got_tfs == tfs).all()
        # block boundaries + impact-pair metadata (stats-free block max)
        assert enc["n"].sum() == n
        k = 0
        for i in range(len(enc["n"])):
            bn = enc["n"][i]
            assert enc["first_doc_id"][i] == ids[k]
            assert enc["last_doc_id"][i] == ids[k + bn - 1]
            assert enc["max_tf"][i] == tfs[k : k + bn].max()
            assert enc["min_dl"][i] == dls[k : k + bn].min()
            k += bn


def test_block_single_posting():
    enc = encode_sublist(np.array([42]), np.array([3]), dls=np.array([7]))
    ids, tfs = decode_block(int(enc["first_doc_id"][0]), enc["doc_gaps"][0], enc["tfs"][0])
    assert list(ids) == [42] and list(tfs) == [3]
    assert enc["doc_gaps"][0] == b""
    assert enc["max_tf"][0] == 3 and enc["min_dl"][0] == 7


def test_nonmonotonic_rejected():
    with pytest.raises(ValueError):
        encode_sublist(np.array([5, 5]), np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_sublist(np.array([5, 4]), np.array([1, 1]))


def test_positional_stream_roundtrip():
    """4th-stream contract: per-posting position blobs concatenate per block
    in doc order and split back exactly via the tfs stream (no length
    sidecar) — including blobs that span block boundaries' worth of values
    and tf=1 single-value blobs."""
    from sparksearch.codec import split_positions

    rng = np.random.default_rng(11)
    for n in [1, 5, 127, 128, 129, 400]:
        ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, n).astype(np.int64)
        dls = rng.integers(1, 500, n).astype(np.int64)
        blobs = []
        for tf in tfs:
            pos = np.sort(rng.choice(5000, size=int(tf), replace=False)) + 1
            gaps = np.concatenate(([pos[0]], np.diff(pos))).astype(np.uint64)
            blobs.append(varint_encode(gaps))
        enc = encode_sublist(ids, tfs, block_size=128, dls=dls,
                             pos_blobs=np.asarray(blobs, dtype=object))
        assert len(enc["poss"]) == len(enc["n"])
        got = []
        k = 0
        for i, bn in enumerate(enc["n"]):
            block_tfs = varint_decode(enc["tfs"][i]).astype(np.int64)
            assert (block_tfs == tfs[k : k + bn]).all()
            got.extend(split_positions(block_tfs, enc["poss"][i]))
            k += bn
        assert got == blobs


def test_split_positions_validates_count():
    from sparksearch.codec import split_positions

    blob = varint_encode(np.array([3, 2], dtype=np.uint64))
    with pytest.raises(ValueError, match="position stream"):
        split_positions(np.array([3]), blob)  # tfs say 3 values, stream has 2
    assert split_positions(np.array([], dtype=np.int64), b"") == []
