"""Stage 2 — OIE triples + NER mentions + entity-link scoring (T3/T4).

The Annotator is a callable CLASS so per-worker setup (compiled verb
regex, gazetteer alias index — the stand-ins for warm spaCy/OIE model
state, SURVEY.md section 2.3) runs once per worker and each Arrow
batch flows through ``__call__``. Two executions: stateless tasks
with a per-worker-process singleton (default; zero pool spin-up), or
a bounded actor pool (``compute="actors"``) when model state is heavy
or must be pinned.

Output is ONE unified Arrow table per batch carrying both record kinds
(kind='triple' | 'mention') so extraction runs in a single pass over
the text; downstream stages split by the `kind` partition column. This
mirrors the reference's single-pass member ingestion into typed named
graphs (/root/reference/ldes-consumer/app.py:309-317).
"""

from __future__ import annotations

import pyarrow as pa

ANNOTATED = pa.schema(
    [
        pa.field("kind", pa.string()),
        pa.field("url", pa.string()),
        pa.field("graph", pa.string()),
        # triple fields (null for mentions)
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_is_literal", pa.bool_()),
        pa.field("obj_datatype", pa.string()),
        pa.field("obj_lang", pa.string()),
        # mention fields (null for triples)
        pa.field("surface", pa.string()),
        pa.field("norm_surface", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("ner_type", pa.string()),
        pa.field("cand_entity", pa.string()),
        pa.field("link_score", pa.float32()),
        # error side-channel (kind='error'; W5 FAILURE_IS_FATAL=false)
        pa.field("error", pa.string()),
    ]
)


class Annotator:
    """Actor-pool stage: text -> unified (triple|mention) rows.

    Failure policy mirrors the reference's FAILURE_IS_FATAL=false
    default (/root/reference/ldes-consumer/app.py:342): a row whose
    annotation raises is skipped and counted, never fatal.
    """

    def __init__(self) -> None:
        # Per-actor setup (once): import compiles the verb-alternation
        # regex and builds the alias index at module import time.
        from k_gap_ray.oracle import kernel

        self._kernel = kernel
        self.errors = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self._kernel
        # two typed column groups, concatenated once at the end — no
        # generic per-column dispatch in the row loop (hot path)
        t_url: list = []; t_graph: list = []; t_subj: list = []
        t_pred: list = []; t_obj: list = []; t_lit: list = []
        t_dt: list = []
        m_url: list = []; m_graph: list = []; m_surface: list = []
        m_norm: list = []; m_start: list = []; m_end: list = []
        m_ner: list = []; m_cand: list = []; m_score: list = []

        e_url: list = []; e_msg: list = []

        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        for url, text in zip(urls, texts):
            try:
                graph = k.graph_for_url(url)
                triples, mentions = k.extract_from_text(text)
            except Exception as exc:
                # reference semantics FAILURE_IS_FATAL=false
                # (/root/reference/ldes-consumer/app.py:342): the row is
                # routed to the error side-channel, never fatal
                self.errors += 1
                e_url.append(url)
                e_msg.append(f"{type(exc).__name__}: {exc}"[:500])
                continue
            for t in triples:
                t_url.append(url); t_graph.append(graph)
                t_subj.append(t.subj); t_pred.append(t.pred)
                t_obj.append(t.obj); t_lit.append(t.obj_is_literal)
                # "" (not null) for absent datatype/lang: quad-key
                # concat and groupby keys stay null-free
                t_dt.append(t.obj_datatype or "")
            for m in mentions:
                m_url.append(url); m_graph.append(graph)
                m_surface.append(m.surface); m_norm.append(m.norm)
                m_start.append(m.start); m_end.append(m.end)
                m_ner.append(m.ner_type); m_cand.append(m.cand_entity)
                m_score.append(m.link_score)

        # per-batch distinct (norm_surface, surface) pairs as kind=vocab
        # rows: a combiner-at-source, so the canonicalization stage
        # reads these tiny rows instead of rescanning the mentions
        # (formerly a DRIVER-side re-read+dedup of every mention row —
        # a per-group fixed cost that didn't scale with CPUs)
        vocab = sorted(set(zip(m_norm, m_surface)))
        v_norm = [p[0] for p in vocab]
        v_surf = [p[1] for p in vocab]

        n_t, n_m, n_e, n_v = len(t_subj), len(m_surface), len(e_url), len(vocab)
        none_t = [None] * n_t
        none_m = [None] * n_m
        none_e = [None] * n_e
        none_v = [None] * n_v
        return pa.Table.from_pydict({
            "kind": ["triple"] * n_t + ["mention"] * n_m + ["error"] * n_e
                    + ["vocab"] * n_v,
            "url": t_url + m_url + e_url + none_v,
            "graph": t_graph + m_graph + none_e + none_v,
            "subj": t_subj + none_m + none_e + none_v,
            "pred": t_pred + none_m + none_e + none_v,
            "obj": t_obj + none_m + none_e + none_v,
            "obj_is_literal": t_lit + none_m + none_e + none_v,
            "obj_datatype": t_dt + none_m + none_e + none_v,
            "obj_lang": [""] * n_t + none_m + none_e + none_v,
            "surface": none_t + m_surface + none_e + v_surf,
            "norm_surface": none_t + m_norm + none_e + v_norm,
            "start": none_t + m_start + none_e + none_v,
            "end": none_t + m_end + none_e + none_v,
            "ner_type": none_t + m_ner + none_e + none_v,
            "cand_entity": none_t + m_cand + none_e + none_v,
            "link_score": none_t + m_score + none_e + none_v,
            "error": none_t + none_m + e_msg + none_v,
        }, schema=ANNOTATED)


# per-worker-process singleton for the tasks path: state builds once
# per Ray worker (first batch) and is reused by every later task the
# worker runs — actor-style amortization without actor-pool spin-up.
_WORKER_ANNOTATOR: Annotator | None = None


def _annotate_batch(batch: pa.Table) -> pa.Table:
    global _WORKER_ANNOTATOR
    if _WORKER_ANNOTATOR is None:
        _WORKER_ANNOTATOR = Annotator()
    return _WORKER_ANNOTATOR(batch)


def annotate_stage(text_ds, concurrency: int | tuple | None = None,
                   batch_size: int = 512, num_cpus: float = 1,
                   compute: str = "tasks",
                   ray_remote_args: dict | None = None):
    """(url, text, ...) -> unified annotated rows.

    compute="tasks" (default): stateless tasks with per-worker cached
    annotator state — elastic, no pool ramp-up; right for cheap
    per-worker init. compute="actors": a bounded actor pool — right
    when init is heavy (real model weights) or state must be pinned;
    pass `concurrency` to size it (leave CPU headroom for the
    upstream read/extract or the pipeline serializes).

    ``ray_remote_args`` (X5): per-stage scheduling/runtime overrides —
    ``runtime_env`` (container image / pip deps for the model stage),
    ``num_gpus``, ``resources``, ``memory`` — forwarded verbatim to
    the underlying ``map_batches`` call, mirroring the reference's
    per-component image selection (ldes-consumer/app.py:610-611).
    """
    extra = dict(ray_remote_args or {})
    if compute == "tasks":
        return text_ds.map_batches(
            _annotate_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            **extra,
        )
    return text_ds.map_batches(
        Annotator,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (2, 8),
        num_cpus=num_cpus,
        **extra,
    )


def split_annotated(annotated_ds):
    """annotated -> (triples_ds, mentions_ds) with their final schemas.

    NOTE: each returned Dataset re-executes its upstream when consumed;
    callers either materialize the (small, html-free) annotated dataset
    first or read it back from the stage's Parquet checkpoint
    (pipeline.py does the latter — kind is a partition column, so each
    side prunes the other's files at the read).
    """
    triples = (
        annotated_ds
        .filter(expr="kind == 'triple'")
        .select_columns(["subj", "pred", "obj", "obj_is_literal",
                         "obj_datatype", "obj_lang", "graph", "url"])
    )
    mentions = (
        annotated_ds
        .filter(expr="kind == 'mention'")
        .select_columns(["url", "surface", "norm_surface", "start", "end",
                         "ner_type", "cand_entity", "link_score"])
    )
    return triples, mentions
