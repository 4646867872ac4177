"""spark-fulltext-engine: a PySpark-native inverted-index build + BM25 query
engine with the capabilities of ``andrewstevens59/HadoopSearchEngine``
(reference, read-only, at /root/reference), built from scratch — not a port.

Layout:
    kernel/     pure deterministic kernels (extraction, tokenization, varint
                codec, BM25 math) shared verbatim with the single-node oracle
    sources/    corpus synthesis + WARC-ish byte-stream reader + table loaders
    functions/  text analysis / dedup / similarity / multimodal column ops
    operators/  reusable DataFrame operator compositions (top-k, k-th order
                stat, PageRank, block-max WAND query executor)
    plans/      the staged index-build pipeline with lineage manifests/resume
    streaming/  Structured Streaming incremental variants
"""

__version__ = "0.1.0"
