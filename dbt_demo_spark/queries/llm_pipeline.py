"""LLM-training-data pipeline operators over documents / embeddings / events.

Dedup (exact + near-dup), similarity search, text analysis, multimodal
plumbing, and the streaming twin's batch form.  Populated in M4.
"""

from __future__ import annotations
