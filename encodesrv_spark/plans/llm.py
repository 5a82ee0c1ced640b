"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing, event-stream analytics.  Populated incrementally —
see operators/ for the implementations."""

from __future__ import annotations
