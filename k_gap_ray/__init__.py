"""k_gap_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the query / data-processing capabilities of
vliz-be-opsci/k-gap (see /root/repo/SURVEY.md) expressed as streaming
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

    pages (url, warc_ts, html, text, lang)
      -> extract_text        (stateless map_batches, pyarrow)
      -> annotate            (actor pool: OIE triples + NER mentions + link)
      -> canonicalize        (minhash-LSH blocking + union-find over groupby)
      -> materialize         (sort("subj") -> partitioned Parquet graph)

plus the reference's relational/aggregation operator surface
(SURVEY.md section 2) as thin functions over Arrow tables, and
large-scale training-data ops (dedup, similarity search, text
analysis, multimodal plumbing).

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (driver / bench.py / pytest fixture).
"""

__version__ = "0.1.0"
