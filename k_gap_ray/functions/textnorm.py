"""Unicode NFC normalization over a string column.

Web corpora mix composed and decomposed encodings of the same visible
text (e.g. ``é`` as U+00E9 vs ``e`` + U+0301); exact dedup, token
hashing and fingerprinting all silently fracture on the difference, so
canonicalizing to NFC is the first transform of any text pipeline.

Engine note (measured, pyarrow 16.1): ``pc.utf8_normalize(...,
form="NFC")`` DECOMPOSES regardless of the requested form — composed
input comes back decomposed — so the Arrow kernel is unusable for
NFC.  The shape here instead:

- fast path: a batch whose byte length equals its codepoint length
  everywhere is pure ASCII -> NFC is the identity, zero work, zero
  copies (two vectorized length kernels and one ``all``);
- fallback: only for batches that DO contain non-ASCII rows, the
  non-ASCII minority is normalized with ``unicodedata.normalize`` (the
  CPython table, byte-identical to DuckDB's utf8proc-backed
  ``nfc_normalize`` on every probe in tests) and scattered back.

That makes the hot path vectorized for the overwhelmingly-ASCII web
case while keeping full Unicode correctness; the per-row cost is paid
only on rows that need it.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _nfc_array(s: pa.Array) -> tuple[pa.Array, bool]:
    """NFC-normalize one string array; returns (array, changed_any)."""
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    nb = pc.binary_length(s)
    ncp = pc.utf8_length(s)
    non_ascii = pc.fill_null(pc.not_equal(nb, ncp), False)
    if not pc.any(non_ascii).as_py():
        return s, False
    mask = non_ascii.to_numpy(zero_copy_only=False)
    arr = s.to_numpy(zero_copy_only=False)          # object dtype
    idx = np.nonzero(mask)[0]
    changed = False
    for i in idx:
        v = unicodedata.normalize("NFC", arr[i])
        if v != arr[i]:
            arr[i] = v
            changed = True
    return pa.array(arr, pa.string()), changed


def normalize_nfc(ds, col: str, out_col: str | None = None):
    """Append (or replace) ``col`` NFC-normalized. Null stays null;
    pure-ASCII batches pass through untouched."""
    out = out_col or col

    def f(t: pa.Table) -> pa.Table:
        norm, _ = _nfc_array(t.column(col))
        if out in t.column_names:
            t = t.drop_columns([out])
        return t.append_column(out, norm)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def nfc_stats(ds, col: str, id_col: str):
    """Per-row normalization evidence: (id_col, n_raw, n_nfc, changed)
    with codepoint lengths before/after and a changed flag — the
    audit table a canonicalization pass is verified with."""

    def f(t: pa.Table) -> pa.Table:
        s = t.column(col).combine_chunks() \
            if isinstance(t.column(col), pa.ChunkedArray) else t.column(col)
        norm, _ = _nfc_array(s)
        return pa.table({
            id_col: t.column(id_col),
            "n_raw": pc.cast(pc.utf8_length(s), pa.int64()),
            "n_nfc": pc.cast(pc.utf8_length(norm), pa.int64()),
            "changed": pc.cast(
                pc.fill_null(pc.not_equal(s, norm), False), pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
