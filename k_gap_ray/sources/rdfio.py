"""N-Triples/N-Quads text <-> triples-table conversion (S2/S8).

The reference bulk-loads and dumps RDF as text over HTTP
(/root/reference/docs/components/graphdb.md:249-277,410-428). Here the
same capability is a pair of vectorized-enough map_batches kernels
over ``ray.data.read_text`` lines / formatted text rows. One compiled
regex per worker; no driver-side row loops.
"""

from __future__ import annotations

import re

import pyarrow as pa

# <s> <p> <o|"lit"[^^<dt>|@lang]> [<graph>] .
_NT_RE = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r'(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)'
    r'(?:\s+<([^>]*)>)?\s*\.\s*$')

_ESCAPES = {"\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"', "\\\\": "\\"}
_UNESC_RE = re.compile(r'\\[nrt"\\]')
_ESC_RE = re.compile(r'[\n\r\t"\\]')
_ESC_MAP = {"\n": "\\n", "\r": "\\r", "\t": "\\t", '"': '\\"', "\\": "\\\\"}


def _unescape(s: str) -> str:
    return _UNESC_RE.sub(lambda m: _ESCAPES[m.group(0)], s)


def _escape(s: str) -> str:
    return _ESC_RE.sub(lambda m: _ESC_MAP[m.group(0)], s)


def parse_ntriples_batch(batch: pa.Table) -> pa.Table:
    """text lines -> triples rows (bad lines dropped, counted in-row)."""
    cols: dict[str, list] = {k: [] for k in
                             ("subj", "pred", "obj", "obj_is_literal",
                              "obj_datatype", "obj_lang", "graph", "url")}
    for line in batch.column("text").to_pylist():
        m = _NT_RE.match(line or "")
        if not m:
            continue
        s, p, o_iri, o_lit, dt, lang, g = m.groups()
        cols["subj"].append(s)
        cols["pred"].append(p)
        if o_iri is not None:
            cols["obj"].append(o_iri)
            cols["obj_is_literal"].append(False)
            cols["obj_datatype"].append("")
            cols["obj_lang"].append("")
        else:
            cols["obj"].append(_unescape(o_lit))
            cols["obj_is_literal"].append(True)
            cols["obj_datatype"].append(dt or "")
            cols["obj_lang"].append(lang or "")
        cols["graph"].append(g or "")
        cols["url"].append("")
    return pa.table({
        "subj": pa.array(cols["subj"], pa.string()),
        "pred": pa.array(cols["pred"], pa.string()),
        "obj": pa.array(cols["obj"], pa.string()),
        "obj_is_literal": pa.array(cols["obj_is_literal"], pa.bool_()),
        "obj_datatype": pa.array(cols["obj_datatype"], pa.string()),
        "obj_lang": pa.array(cols["obj_lang"], pa.string()),
        "graph": pa.array(cols["graph"], pa.string()),
        "url": pa.array(cols["url"], pa.string()),
    })


def read_ntriples(paths):
    """N-Triples/N-Quads file(s) -> triples Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(parse_ntriples_batch,
                                           batch_format="pyarrow")


def format_ntriples_batch(batch: pa.Table) -> pa.Table:
    """triples rows -> one N-Quads line per row (text column)."""
    lines = []
    graphs = (batch.column("graph").to_pylist()
              if "graph" in batch.column_names else [None] * batch.num_rows)
    for s, p, o, is_lit, dt, lang, g in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("obj_is_literal").to_pylist(),
            batch.column("obj_datatype").to_pylist(),
            batch.column("obj_lang").to_pylist(),
            graphs):
        if is_lit:
            term = f'"{_escape(o)}"'
            if dt:
                term += f"^^<{dt}>"
            elif lang:
                term += f"@{lang}"
        else:
            term = f"<{o}>"
        gpart = f" <{g}>" if g else ""
        lines.append(f"<{s}> <{p}> {term}{gpart} .")
    return pa.table({"text": pa.array(lines, pa.string())})


def write_ntriples(triples_ds, out_dir: str):
    """triples Dataset -> directory of .nt shard files (graph dump S8).

    Each batch writes one deterministic content-addressed shard (safe
    under task retries: a rerun overwrites the same file with the same
    bytes). Returns the shard-manifest Dataset (path, n_lines)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        t = format_ntriples_batch(batch)
        body = "\n".join(t.column("text").to_pylist()) + "\n"
        name = hashlib.blake2b(body.encode("utf-8"), digest_size=10).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.nt")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(body)
        os.replace(tmp, path)
        return pa.table({"path": [path], "n_lines": [t.num_rows]})

    return triples_ds.map_batches(write_shard, batch_format="pyarrow")
