"""Single-node oracle: pure-Python/numpy reference implementation of the
whole pipeline (extraction -> tokens -> postings -> link graph -> PageRank ->
BM25 top-k), sharing the deterministic kernels in
``hadoopsearchengine_spark.kernel`` verbatim.

This mirrors the reference repo's test strategy: every distributed stage is
checked against a serial in-memory recomputation (reference
DyableCommand/TestHitList.h:33-60, DyablePuleRank/DyableCommand/
TestPulseRank.h:82-192 with 1e-5 tolerance, DyableSort/SortHitList/
TestSortHitList.h:14-51 sortedness invariant).
"""
