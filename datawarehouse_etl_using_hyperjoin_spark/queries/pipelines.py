"""North-star training-data pipeline queries: dedup, similarity search,
text analysis, multimodal plumbing.  Implemented in a later milestone."""

from __future__ import annotations
