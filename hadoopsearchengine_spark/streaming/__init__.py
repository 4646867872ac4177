"""Structured Streaming variants: incremental token counts and index-delta
maintenance. The reference is batch-only (SURVEY §2.4 'streaming: none') —
its incremental story is re-running stages over new doc sets
(DocumentDatabase.h:1-16); these modules provide the genuine streaming
re-expression."""
