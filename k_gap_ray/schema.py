"""Arrow schemas for every table the engine reads or emits.

Shapes follow the driver contract (`BASELINE.json` input_hint) and the
reference's data model (SURVEY.md section 1.4; FIXTURES.md F1/F2):
the reference stores RDF triples in named graphs
(`/root/reference/ldes-consumer/app.py:309-317`) and projects query
results to columnar tables (`jupyter/kgap/notebooks/kgap_tools.py:22-31`),
so every logical table here is a pyarrow schema.
"""

from __future__ import annotations

import pyarrow as pa

# F1 — primary input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# F2 — triples (pre- and post-canonicalization share this shape).
# `graph` is the named-graph / lineage partition column, mirroring the
# reference's per-feed named graphs urn:kgap:{prefix}:{feed}
# (/root/reference/ldes-consumer/app.py:225,309-317).
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_is_literal", pa.bool_()),
        pa.field("obj_datatype", pa.string()),
        pa.field("obj_lang", pa.string()),
        pa.field("graph", pa.string()),
        pa.field("url", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("surface", pa.string()),
        pa.field("norm_surface", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("ner_type", pa.string()),
        pa.field("cand_entity", pa.string()),
        pa.field("link_score", pa.float32()),
    ]
)

ENTITIES = pa.schema(
    [
        pa.field("entity_id", pa.string()),
        pa.field("members", pa.list_(pa.string())),
        pa.field("surface_forms", pa.list_(pa.string())),
        pa.field("size", pa.int64()),
    ]
)

LINEAGE = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition_id", pa.string()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("errors", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("wall_s", pa.float64()),
    ]
)

# F3 — LDES-style versioned stream members (SURVEY.md section 2.8).
FEED_MEMBERS = pa.schema(
    [
        pa.field("feed", pa.string()),
        pa.field("member_id", pa.string()),
        pa.field("entity_uri", pa.string()),
        pa.field("version_ts", pa.timestamp("us")),
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("batch_no", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
