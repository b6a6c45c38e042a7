"""Deterministic synthetic `pages` corpus (FIXTURES.md F1, input_hint shape).

Each row is a pure function of (seed, row index): generation is
order-independent and shardable, so bench-scale corpora are written as
parallel Parquet shards without any cross-shard coordination. Sentences
are "{EntityA} {verb phrase} {EntityB}." over the gazetteer in
``oracle.kernel`` with a Zipf-distributed head entity (skew fixture for
the salted canonicalization groupby), which makes the golden triple /
mention / cluster sets computable in closed form by the oracle module.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from k_gap_ray.oracle.kernel import GAZETTEER, LITERAL_VERB_MAP, VERB_MAP

_BASE_TS = dt.datetime(2024, 1, 1)
_LANGS = ["en", "de", "es", "fr", "zh"]
_VERBS = sorted(VERB_MAP)
_LIT_VERBS = sorted(LITERAL_VERB_MAP)
# Zipf-ish weights over gazetteer entities: entity 0 is the head.
_WEIGHTS = [1.0 / (r + 1) ** 1.2 for r in range(len(GAZETTEER))]

_BOILER_NAV = "<nav>Home | About | Data | Contact</nav>"
_HTML_HEAD = "<html><head><title>{title}</title></head><body>"


def _page_row(seed: int, i: int, n_sites: int, min_sent: int = 3,
              sent_spread: int = 8) -> dict:
    rng = random.Random(seed * 1_000_003 + i)
    n_sent = min_sent + rng.randrange(sent_spread)
    sentences: list[str] = []
    for _ in range(n_sent):
        si = rng.choices(range(len(GAZETTEER)), weights=_WEIGHTS)[0]
        s_surf = rng.choice(GAZETTEER[si][2])
        if rng.random() < 0.15:
            verb = rng.choice(_LIT_VERBS)
            lit = str(1900 + rng.randrange(125)) if verb == "was founded in" \
                else str(5 + rng.randrange(5000))
            sentences.append(f"{s_surf} {verb} {lit}.")
        else:
            oi = rng.choices(range(len(GAZETTEER)), weights=_WEIGHTS)[0]
            while oi == si:
                oi = rng.randrange(len(GAZETTEER))
            o_surf = rng.choice(GAZETTEER[oi][2])
            verb = rng.choice(_VERBS)
            sentences.append(f"{s_surf} {verb} {o_surf}.")
    text = "\n".join(sentences)
    site = i % n_sites
    paras = "".join(f"<p>{s}</p>" for s in sentences)
    html = (
        _HTML_HEAD.format(title=f"Report {i}")
        + _BOILER_NAV
        + f'<div class="content">{paras}</div>'
        + f"<footer>(c) 2024 site{site}.example — all rights reserved</footer>"
        + "</body></html>"
    )
    return {
        "url": f"https://site{site}.example/page/{i}",
        "warc_ts": _BASE_TS + dt.timedelta(seconds=i * 13),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": _LANGS[i % len(_LANGS)],
    }


def gen_pages(n: int, seed: int = 42, n_sites: int = 50,
              start: int = 0, min_sent: int = 3,
              sent_spread: int = 8) -> pa.Table:
    """Generate rows [start, start+n) of the corpus as one Arrow table."""
    rows = [_page_row(seed, i, n_sites, min_sent, sent_spread)
            for i in range(start, start + n)]
    from k_gap_ray.schema import PAGES
    return pa.Table.from_pylist(rows, schema=PAGES)


def write_pages(out_dir: str, n: int, seed: int = 42, n_sites: int = 50,
                shard_rows: int = 10_000, min_sent: int = 3,
                sent_spread: int = 8) -> list[str]:
    """Write the n-page corpus as Parquet shards; returns shard paths.

    Idempotent: an existing complete corpus (matching _MANIFEST) is
    reused — bench runs at two parallelism levels share one input.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST")
    tag = (f"n={n} seed={seed} sites={n_sites} shard={shard_rows} "
           f"sent={min_sent}+{sent_spread} v2")
    paths = [
        os.path.join(out_dir, f"pages-{s:05d}.parquet")
        for s in range((n + shard_rows - 1) // shard_rows)
    ]
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read() == tag and all(os.path.exists(p) for p in paths):
                return paths

    def _write_shard(s: int, path: str) -> str:
        start = s * shard_rows
        count = min(shard_rows, n - start)
        pq.write_table(gen_pages(count, seed=seed, n_sites=n_sites,
                                 start=start, min_sent=min_sent,
                                 sent_spread=sent_spread), path)
        return path

    # rows are pure functions of (seed, i): shards generate in parallel
    # when a Ray session exists, sequentially otherwise
    import ray

    if ray.is_initialized() and len(paths) > 1:
        shard_task = ray.remote(num_cpus=1)(_write_shard)
        ray.get([shard_task.remote(s, p) for s, p in enumerate(paths)])
    else:
        for s, path in enumerate(paths):
            _write_shard(s, path)
    with open(manifest, "w") as f:
        f.write(tag)
    return paths
