"""Deterministic synthetic corpus in the BASELINE.json:15 input_hint shape:
(repo, path, commit, lang, content) — FIXTURES.md §B.

The driver fixtures' vocabulary is near-uniform (31 terms), which cannot
exercise the mandated Zipf-skew handling (SURVEY.md §2.4 B1), so this
generator draws content tokens Zipf(a=1.3) from a 5,000-term code-like
vocabulary. Everything derives from numpy.random.default_rng(seed) — no
wall-clock, no uuid, reproducible across sessions.
"""

from __future__ import annotations

import hashlib

import numpy as np

LANGS = ["py", "java", "c", "go", "js"]
_EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

_STEMS = [
    "get", "set", "run", "read", "write", "open", "close", "init", "load", "save",
    "parse", "build", "merge", "split", "hash", "sort", "scan", "join", "map", "fold",
    "idx", "ptr", "buf", "len", "cnt", "tmp", "val", "key", "node", "list",
    "for", "if", "else", "while", "return", "import", "class", "def", "func", "var",
]
_SUFFIXES = ["", "_value", "_count", "_index", "_buffer", "_table", "_row", "_col",
             "_id", "_ptr", "_impl", "_util", "_cfg", "_ctx", "_err", "_ok"]


def vocab(size: int = 5000) -> list[str]:
    """Deterministic code-like identifier vocabulary of exactly ``size`` terms."""
    out: list[str] = []
    i = 0
    while len(out) < size:
        stem = _STEMS[i % len(_STEMS)]
        suf = _SUFFIXES[(i // len(_STEMS)) % len(_SUFFIXES)]
        n = i // (len(_STEMS) * len(_SUFFIXES))
        out.append(f"{stem}{suf}" + (f"{n}" if n else ""))
        i += 1
    return out


def gen_corpus(n_docs: int, seed: int = 42, zipf_a: float = 1.3, vocab_size: int = 5000):
    """Return a pandas DataFrame (repo, path, commit, lang, content, sha256).

    ``sha256`` is the generation-time expected hash used by the S3
    content-integrity tests (BASELINE.json:15 row invariant)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    v = np.array(vocab(vocab_size))
    lens = rng.integers(20, 401, size=n_docs)
    # Zipf ranks clipped into the vocab; rank 1 ↦ hottest term.
    rows = []
    for i in range(n_docs):
        ranks = np.minimum(rng.zipf(zipf_a, size=int(lens[i])), vocab_size) - 1
        content = " ".join(v[ranks])
        repo = f"org{i % 97}/repo{i % 1013}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/d{i % 53}/f{i}.{_EXT[lang]}"
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
        rows.append(
            (repo, path, commit, lang, content,
             hashlib.sha256(content.encode()).hexdigest())
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content", "sha256"])
