"""Entity canonicalization kernels: shingles, MinHash-LSH, union-find.

Deterministic (fixed permutation seeds, blake2b base hashes — never
Python ``hash()``). The same functions drive both the single-process
oracle clustering (golden clusters for P/R tests) and the distributed
Ray path in ``k_gap_ray.ops.canonicalize`` (minhash per batch, band
keys via flat_map, candidate pairs per groupby block, label-propagation
union-find) — SURVEY.md sections 2.5 A8 / 2.7 D5 / 7.4.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

SHINGLE_K = 3
# 16 bands x 2 rows: P(candidate | jaccard s) = 1-(1-s^2)^16, ~0.96 at
# s=0.42 — high recall at the verify threshold; false candidates are
# cheap because every pair is Jaccard-verified before union.
NUM_PERM = 32
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS  # 2
JACCARD_THRESHOLD = 0.42
MAX_BLOCK = 64  # cap candidate generation per LSH block (head-entity guard)

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(12345)  # fixed permutation seed
_PERM_A = _rng.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64)


def char_shingles(s: str, k: int = SHINGLE_K) -> set[str]:
    s = f"^{s}$"
    if len(s) <= k:
        return {s}
    return {s[i:i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _base_hashes(shingles: set[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(sh.encode("utf-8"), digest_size=8).digest(),
                        "big") & _MERSENNE
         for sh in shingles),
        dtype=np.int64, count=len(shingles))


def minhash_signature(s: str) -> np.ndarray:
    """NUM_PERM int64 minhash signature of the char-shingle set of s."""
    h = _base_hashes(char_shingles(s))
    if h.size == 0:
        return np.zeros(NUM_PERM, dtype=np.int64)
    # (num_perm, n_shingles) universal hashing mod Mersenne prime
    vals = (np.multiply.outer(_PERM_A, h, dtype=np.int64) + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_signatures(strings: list[str]) -> np.ndarray:
    """Vectorized-ish batch variant: (n, NUM_PERM) int64."""
    out = np.empty((len(strings), NUM_PERM), dtype=np.int64)
    for i, s in enumerate(strings):
        out[i] = minhash_signature(s)
    return out


def band_keys(sig: np.ndarray) -> list[str]:
    """LSH band keys for one signature: BANDS strings 'b{i}:{hash}'."""
    keys = []
    for b in range(BANDS):
        chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        keys.append(f"b{b}:{digest}")
    return keys


def candidate_pairs_in_block(members: list[str]) -> list[tuple[str, str]]:
    """Deterministic candidate pairs within one LSH block.

    Members are sorted lexicographically; blocks larger than MAX_BLOCK
    are truncated (head-entity guard — the drop is logged by the
    caller). All pairs within the (capped) block are candidates.
    """
    ms = sorted(set(members))[:MAX_BLOCK]
    return [(ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))]


def verify_pair(a: str, b: str, threshold: float = JACCARD_THRESHOLD) -> bool:
    return jaccard(char_shingles(a), char_shingles(b)) >= threshold


class UnionFind:
    """Classic path-halving union-find with lexicographic-min roots.

    Roots are chosen as the lexicographic minimum of each component so
    canonical ids never depend on processing order (SURVEY.md 7.5.1).
    """

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            gp = self.parent[p]
            self.parent[x] = gp
            x, p = p, gp
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo

    def components(self) -> dict[str, str]:
        return {x: self.find(x) for x in self.parent}


def cluster_surfaces(norm_surfaces: list[str],
                     threshold: float = JACCARD_THRESHOLD) -> dict[str, str]:
    """Single-process golden clustering: norm surface -> canonical root.

    Pipeline-identical semantics: minhash -> LSH banding -> capped
    in-block pairs -> Jaccard verify -> union-find -> lexicographic-min
    roots. Every surface maps somewhere (singletons map to themselves).
    """
    uniq = sorted(set(norm_surfaces))
    uf = UnionFind()
    for s in uniq:
        uf.find(s)
    blocks: dict[str, list[str]] = {}
    sigs = minhash_signatures(uniq)
    for s, sig in zip(uniq, sigs):
        for key in band_keys(sig):
            blocks.setdefault(key, []).append(s)
    for members in blocks.values():
        if len(members) < 2:
            continue
        for a, b in candidate_pairs_in_block(members):
            if verify_pair(a, b, threshold):
                uf.union(a, b)
    return uf.components()


_SLUG_RE = re.compile(r"[^a-z0-9]+")


def entity_iri(canonical_root: str) -> str:
    """Canonical entity IRI from a component root (a norm surface)."""
    slug = _SLUG_RE.sub("-", canonical_root).strip("-")
    return f"urn:kgap:entity:{slug}"
