"""Reusable operators the engine exposes beyond raw DataFrame methods:
as-of joins, per-group top-k, sessionization, dedup (exact/MinHash/
SimHash), similarity search, text analysis, multimodal plumbing."""
