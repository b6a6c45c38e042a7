"""Text-analysis operators over a document table (doc_id, text, ...).

All per-batch kernels are vectorized (pyarrow.compute / numpy) or use
per-actor compiled state; nothing iterates Python rows on the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "se", "no"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"},
}


def token_counts(ds):
    """(doc_id, text) -> (doc_id, n_tokens). Single-space-separated
    token count, fully vectorized: #spaces + 1 (0 tokens for '')."""

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        spaces = pc.count_substring(text, pattern=" ")
        nonempty = pc.cast(pc.greater(pc.utf8_length(text), 0), pa.int64())
        n = pc.add(spaces, nonempty)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class BpeishTokenCounter:
    """Token counting with a BPE-ish compiled regex (actor-pool stage:
    the pattern — a stand-in for a real tokenizer load — is compiled
    once per actor)."""

    def __init__(self) -> None:
        # GPT-2-style pretokenizer shape: words, numbers, punctuation runs
        self.pat = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df["n_bpe_tokens"] = df["text"].str.findall(self.pat).str.len().astype("int64")
        return df[["doc_id", "n_bpe_tokens"]]


def bpe_token_counts(ds, concurrency=(1, 4)):
    return ds.map_batches(BpeishTokenCounter, batch_format="pandas",
                          batch_size=1024, concurrency=concurrency)


class LangId:
    """n-gram/stopword-heuristic language ID (actor pool; stopword sets
    + tokenizer compiled once per actor)."""

    def __init__(self) -> None:
        self.word = re.compile(r"[a-zA-Z]+")
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(self.word)

        def best(ws: list[str]) -> str:
            if not ws:
                return "und"
            scores = {lang: sum(w in s for w in ws) for lang, s in self.stop.items()}
            top = max(sorted(scores), key=lambda k: scores[k])
            return top if scores[top] > 0 else "und"

        df["pred_lang"] = toks.map(best)
        return df[["doc_id", "pred_lang"]]


def lang_id(ds, concurrency=(1, 4)):
    return ds.map_batches(LangId, batch_format="pandas", batch_size=2048,
                          concurrency=concurrency)


def quality_scores(ds):
    """Length / punctuation / stopword-ratio quality signals, vectorized."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_chars = text.str.len().astype("int64")
        n_spaces = text.str.count(" ")
        n_tokens = (n_spaces + (n_chars > 0)).astype("int64")
        n_punct = text.str.count(r"[^\w\s]")
        words = text.str.lower().str.findall(r"[a-z]+")
        en = _STOPWORDS["en"]
        stop_frac = words.map(
            lambda ws: sum(w in en for w in ws) / len(ws) if ws else 0.0)
        mean_tok_len = (n_chars - n_spaces) / n_tokens.where(n_tokens > 0, 1)
        score = (
            (n_tokens.clip(0, 200) / 200.0) * 0.4
            + (1.0 - (n_punct / n_chars.where(n_chars > 0, 1)).clip(0, 1)) * 0.2
            + stop_frac.clip(0, 0.5) * 2 * 0.2
            + (1.0 - (mean_tok_len - 5.0).abs().clip(0, 5) / 5.0) * 0.2
        )
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": (n_punct / n_chars.where(n_chars > 0, 1)).round(4),
            "stopword_ratio": stop_frac.round(4),
            "quality": score.round(4),
        })

    return ds.map_batches(f, batch_format="pandas")


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


def _token_hashes(text: str) -> np.ndarray:
    """FNV-1a per whitespace token, numpy uint64."""
    out = np.empty(text.count(" ") + 1 if text else 0, dtype=np.uint64)
    for i, tok in enumerate(text.split(" ") if text else []):
        h = _FP_OFF
        for b in tok.encode("utf-8"):
            h = (h ^ np.uint64(b)) * _FP_BASE
        out[i] = h
    return out


def fingerprints(ds):
    """Deterministic rolling-hash document fingerprint (content id)."""

    def f(t: pa.Table) -> pa.Table:
        fps = []
        for text in t.column("text").to_pylist():
            hs = _token_hashes(text or "")
            acc = np.uint64(0)
            with np.errstate(over="ignore"):
                for h in hs:
                    acc = acc * np.uint64(31) + h
            fps.append(int(acc.astype(np.int64)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(fps, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def simhash64(ds):
    """64-bit SimHash over token hashes (near-dup signature)."""

    def f(t: pa.Table) -> pa.Table:
        out = []
        for text in t.column("text").to_pylist():
            hs = _token_hashes(text or "")
            if hs.size == 0:
                out.append(0)
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            sh = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sh |= np.uint64(1) << np.uint64(b)
            out.append(int(sh.astype(np.int64)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash": pa.array(out, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")
