"""Large-scale training-data operators (dedup, text analysis,
similarity search, multimodal plumbing) — first-class components
alongside the reference-derived operator surface."""
