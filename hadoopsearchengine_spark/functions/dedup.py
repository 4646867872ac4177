"""Deduplication operators for training-data pipelines, Spark-first.

All of these run JVM-side (built-in functions; no Python UDFs): shingling is
sequence+transform+explode, MinHash uses md5 (a deterministic, cross-engine
hash so the DuckDB oracle can reproduce signatures bit-for-bit), SimHash uses
xxhash64 bits via bitwise expressions.

Scale notes (100 TB corpus):
- exact/fingerprint dedup: one shuffle on the 16-byte digest — the digest is
  computed in the scan projection so only (digest, doc_id) shuffles, not text.
- MinHash-LSH: shingles explode ~L rows/doc but reduce immediately into H
  per-doc signature aggregates (partial aggregation map-side); the band join
  shuffles only (band_key, doc_id). Candidate verification re-joins text for
  candidates only.
- trigram-Jaccard: the shingle self-join is the classic |pairs| blow-up; it
  is gated on a first-stage LSH or used at audit scale. The join key is the
  shingle string; AQE skew handling splits hot shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2


def _shingles_of(toks, n: int):
    """Distinct n-token shingle array expression over a token array
    expression/column. Guard short docs: size-n < 0 would make F.sequence
    descend ([0,-1]) and F.slice throw on start index 0; short/empty docs
    → zero shingles."""
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)
                 ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))


def _tokens_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _tk array<string>) — the tokenizer bound as a column.

    PERFORMANCE NOTES (r6, measured on the sf0.1 corpus):
    - Every shingle consumer must reference the token ARRAY as a
      materialized column, never inline the tokenizer expression into a
      lambda. HOF lambdas (transform/slice) evaluate interpreted — no
      codegen, no common-subexpression elimination — so an inlined
      tokenizer re-runs its regex PER ELEMENT (~25 CPU-seconds per explode
      stage vs ~0.5s for the chained-column shape). `_tk` is
      multi-referenced by _shingles_of, which stops CollapseProject from
      inlining it.
    - NO Filter on token counts here (or in any caller near the scan):
      PushDownPredicate inlines such a filter through the projection and
      the fan-out exchange onto the unsplittable single-task scan, where
      the interpreted tokenizer re-evaluation costs ~10s serial. Row drops
      are expressed as empty-array explodes (in-projection guards), which
      nothing pushes down."""
    from .text import tokens_col
    return df.select(F.col(id_col),
                     tokens_col(F.col(text_col)).alias("_tk"))


def token_shingles(df: DataFrame, text_col: str, id_col: str,
                   n: int = 3) -> DataFrame:
    """Distinct n-token shingles per doc: (id, shingle). Tokens per the
    engine tokenizer (functions.text.tokens_col). Docs without shingles
    are dropped by the explode itself — no Filter node (see
    _tokens_frame)."""
    tk = _tokens_frame(df, text_col, id_col)
    return tk.select(F.col(id_col),
                     F.explode(_shingles_of(F.col("_tk"), n))
                     .alias("shingle"))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content hash: (hash, n_docs, keep_id) where keep_id is
    the smallest doc id in the group (deterministic survivor)."""
    return (df.select(F.md5(F.col(text_col)).alias("text_md5"),
                      F.col(id_col))
            .groupBy("text_md5")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id")))


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n_hashes: int = N_MINHASH,
                       shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature columns mh0..mh{H-1}: for permutation j,
    mh_j = min over shingles of md5(j || '|' || shingle). md5-as-permutation
    is deterministic and reproducible in any engine (the oracle recomputes it
    in SQL).

    r6 shape: explode the (pre-tokenized, see _tokens_frame) shingle
    stream and compute the 8 md5s in a FLAT projection over shingle rows —
    whole-stage codegen applies there, whereas md5 inside a higher-order-
    function lambda evaluates interpreted (measured 5x slower: 208 vs ~40
    CPU-seconds on the 10x corpus). The groupBy(id) min-aggregate combines
    map-side — a doc's exploded rows are co-located, so the exchange
    carries one 8-column row per doc — and doubles as the materialization
    point minhash_lsh_pairs' self-join reuses."""
    sh = token_shingles(df, text_col, id_col, shingle_n)
    proj = sh.select(
        F.col(id_col),
        *[F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle"))).alias(f"h{j}")
          for j in range(n_hashes)])
    return proj.groupBy(id_col).agg(
        *[F.min(f"h{j}").alias(f"mh{j}") for j in range(n_hashes)])


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      n_hashes: int = N_MINHASH, n_bands: int = N_BANDS,
                      shingle_n: int = 3) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate pairs
    (a, b) with a < b.

    r6: the band keys are derived in the same map-only pipeline as the
    signatures and exploded doc-locally (the r5 shape unioned 4 selects
    over the signature subtree, re-running the final aggregate per band),
    then hash-repartitioned ONCE on band_key: the self-join's two sides
    are co-partitioned projections of that single exchange (ReusedExchange
    — without it each side would recompute the whole signature pipeline),
    so band keys and doc ids, never shingles, cross the wire exactly
    once."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    rows_per_band = n_hashes // n_bands
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}")
                                 for r in range(rows_per_band)]))
        for b in range(n_bands)]
    keys = sig.select(F.col(id_col),
                      F.explode(F.array(*band_cols)).alias("band_key"))
    keys = keys.repartition(F.col("band_key"))
    left = keys.select(F.col(id_col).alias("a"), "band_key")
    right = keys.select(F.col(id_col).alias("b"), "band_key")
    return (left.join(right, "band_key")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.5, n: int = 3) -> DataFrame:
    """Exact n-gram-shingle Jaccard near-dup pairs: (a, b, jaccard) for
    jaccard >= threshold, a < b. jaccard rounded to 6dp for cross-engine
    comparison.

    r6 shape: per-doc set sizes are DOC-LOCAL (size of the distinct-shingle
    array — the r5 shape re-tokenized the corpus and aggregated the
    exploded stream a second time just to count it), and the two size
    attaches onto the |pairs|-sized intersection table are explicit
    broadcasts (doc-count-sized; the r5 plan could degrade to shuffling
    the pair table twice when the size estimate exceeded the threshold).
    The shingle equi-join itself stays — it is the exact-intersection
    contract — but everything around it is map-side."""
    sh = token_shingles(df, text_col, id_col, n)
    # set sizes doc-locally from the token-array-chained projection (see
    # _tokens_frame perf note). No zero-shingle filter: n_sh=0 rows can
    # never match a pair from `inter` (inner join), so they are inert —
    # and a Filter here would predicate-push the tokenizer onto the scan.
    # coalesce makes n_sh NON-NULLABLE: otherwise the jaccard>=t filter
    # makes InferFiltersFromConstraints derive isnotnull(n_sh), inline the
    # whole tokenize+shingle tree through the alias and push it onto the
    # unsplittable single-task scan (~10s serial interpreted at sf0.1 —
    # observed in the stage metrics as a 1-task 10-CPU-s scan stage).
    cnt = (_tokens_frame(df, text_col, id_col)
           .select(F.col(id_col),
                   F.coalesce(F.size(_shingles_of(F.col("_tk"), n)),
                              F.lit(0)).alias("n_sh")))
    # a-side hash-partitioned on `a`, b-side broadcast: every row of a
    # given (a, b) pair then lives in a's partition, so HashPartitioning(a)
    # satisfies the groupBy(a, b) clustering and the |pairs|-sized
    # intermediate (116M rows at 10x sf0.1) is aggregated to FINAL counts
    # in one pass without ever crossing an exchange (r6; previously those
    # rows shuffled ~2.7 GB and were re-aggregated on the reduce side).
    a = sh.select(F.col(id_col).alias("a"), "shingle").repartition(
        F.col("a"))
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (a.join(F.broadcast(b), "shingle")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count("*").alias("i")))
    ca = cnt.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    # floor-truncate (not round): integer-ratio doubles are bit-identical
    # across engines, so floor agrees everywhere while round ties differ
    jac = F.floor(
        F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) * 1000000.0
    ) / 1000000.0
    return (inter.join(F.broadcast(ca), "a").join(F.broadcast(cb), "b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def neardup_groups(pairs: DataFrame, docs: DataFrame, id_col: str,
                   iters: int = 8,
                   on_unconverged: str = "warn") -> DataFrame:
    """Resolve candidate near-dup PAIRS into GROUPS with one survivor each —
    the fuzzy analog of ``exact_dedup``'s keep_id contract.

    ``pairs(a, b)``: undirected candidate edges from any pair generator
    (minhash_lsh_pairs / simhash_near_pairs / ngram_jaccard_pairs).
    ``docs``: every doc id (docs in no pair survive as singletons).
    Returns (doc_id, group_id, keep): group_id = smallest doc id reachable
    through the pair graph (connected component), keep = survivor flag
    (doc_id == group_id).

    Connected components via min-label propagation — ``iters`` FIXED rounds
    of label(v) <- min(label(v), min over neighbors' labels). A fixed round
    count keeps the op deterministic and SQL-expressible (the DuckDB oracle
    unrolls the rounds as chained CTEs, the graph_pagerank pattern) and is
    converged whenever iters >= component diameter; LSH candidate components
    are near-cliques (every shared band bucket emits all pairs), so real
    dedup diameters are tiny. Scale: edges are hash-partitioned once and
    persisted, each round shuffles only (node, label); per-round lineage is
    truncated with localCheckpoint. If component diameters ever grow (not a
    dedup shape), the O(log n)-round large-star/small-star alternation
    [Kiveris et al., Connected Components in MapReduce and Beyond] drops in
    behind the same contract.

    ``on_unconverged`` turns the diameter<=iters assumption into a CHECK at
    the cost of one cheap count on the (already-materialized) final round:
    if the LAST round still lowered any label, convergence is unproven —
    a component with diameter > iters would be silently split, each split
    carrying its own keep=true survivor. "warn" (default) emits a
    RuntimeWarning, "raise" raises ValueError, "ignore" skips the check.
    The result itself is always the fixed-``iters`` fixpoint prefix (what
    the SQL-unrolled oracle computes)."""
    if on_unconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_unconverged must be 'warn', 'raise' or 'ignore'")
    ids = docs.select(F.col(id_col).alias("doc_id"))
    fwd = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    rev = pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    edges = fwd.unionByName(rev).repartition("v").persist()
    edges.count()
    labels = ids.withColumn("label", F.col("doc_id"))
    for it in range(iters):
        last = it == iters - 1
        nbr = (edges
               .join(labels.select(F.col("doc_id").alias("v"), "label"), "v")
               .groupBy("u").agg(F.min("label").alias("nbr_min"))
               .withColumnRenamed("u", "doc_id"))
        stepped = (labels.join(nbr, "doc_id", "left")
                   .select("doc_id", F.col("label").alias("_prev"),
                           F.least(F.col("label"),
                                   F.coalesce("nbr_min", F.col("label")))
                           .alias("label"))
                   .localCheckpoint(eager=True))
        if last and on_unconverged != "ignore":
            # checkpointed above, so this count re-reads cached blocks —
            # no extra propagation round is paid for the guard
            changed = stepped.filter(F.col("label") < F.col("_prev")).count()
            if changed:
                msg = (f"neardup_groups: final round {iters} still lowered "
                       f"{changed} label(s) — convergence unproven, some "
                       f"component diameter likely exceeds iters={iters}; "
                       "raise iters or switch to large-star/small-star")
                if on_unconverged == "raise":
                    raise ValueError(msg)
                import warnings
                warnings.warn(msg, RuntimeWarning)
        labels = stepped.select("doc_id", "label")
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("group_id"),
                         (F.col("doc_id") == F.col("label")).alias("keep"))


def simhash(df: DataFrame, text_col: str, id_col: str,
            bits: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash over tokens: bit b of the signature is the sign of the sum
    over token occurrences of (bit b of hash(token) ? +1 : -1). Pure bitwise
    JVM expressions, no UDF.

    hash_fn="xxhash64" (default, fast JVM hash, 64 bits) or "md5" — bit b
    taken from nibble b//4 of the md5 hex digest, any-engine-reproducible so
    the DuckDB oracle recomputes it exactly (bits <= 60 in md5 mode: a set
    bit 63 would not fit a signed BIGINT on the SQL side).

    r6 shape: one explode over the (pre-tokenized, see _tokens_frame)
    token stream, the digest in a flat projection, and the 60 bit-vote
    sums in a map-side-combined groupBy — all whole-stage-codegen'd. The
    r6 doc-local fold variant (per-token ±1 arrays + zip_with aggregate)
    evaluated its lambdas interpreted and measured 2x slower (5.4s vs
    2.5s on the 10x corpus); the explode exchange carries one 60-column
    partial-sum row per doc per task, and the groupBy doubles as the
    materialization point simhash_near_pairs' self-join reuses."""
    from .text import tokens_col
    tk = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("_tk"))
    toks = tk.select(F.col(id_col), F.explode("_tk").alias("tok"))
    one = F.lit(1).cast("long")
    if hash_fn == "md5":
        if bits > 60:
            raise ValueError("md5 mode supports at most 60 bits")
        h = F.md5("tok")

        def hbit(b):
            nib = F.conv(F.substring(h, b // 4 + 1, 1), 16, 10).cast("int")
            return F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))
    else:
        hx = F.xxhash64("tok")

        def hbit(b):
            return F.shiftright(hx, b).bitwiseAND(one)
    vote_cols = [
        F.sum(F.when(hbit(b) != 0, 1).otherwise(-1)).alias(f"v{b}")
        for b in range(bits)
    ]
    votes = toks.groupBy(id_col).agg(*vote_cols)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(one, b))
             .otherwise(F.lit(0).cast("long")))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(sig_df: DataFrame, id_col: str,
                       max_hamming: int = 3,
                       bits: int = 64) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, using the
    4-table prefix-block trick (split the signature into 4 x bits/4-bit
    keys; pairs within distance 3 share at least one key) then exact
    hamming filter."""
    width = bits // 4
    mask = F.lit((1 << width) - 1)
    # r6: the 4 block keys are one doc-local array explode (the r5 shape
    # unioned 4 selects, recomputing the signature subtree per block), and
    # ONE hash exchange on block co-partitions the self-join's two sides
    # (ReusedExchange — without it each side recomputes the signature
    # pipeline). Explode-of-4-array == the former 4-way union, row for row.
    block_cols = [
        F.concat(F.lit(f"{p}:"),
                 F.shiftright(F.col("simhash"), p * width).bitwiseAND(mask)
                 .cast("string"))
        for p in range(4)]
    blocks = sig_df.select(F.col(id_col), F.col("simhash"),
                           F.explode(F.array(*block_cols)).alias("block"))
    blocks = blocks.repartition(F.col("block"))
    a = blocks.select(F.col(id_col).alias("a"),
                      F.col("simhash").alias("sa"), "block")
    b = blocks.select(F.col(id_col).alias("b"),
                      F.col("simhash").alias("sb"), "block")
    cand = (a.join(b, "block").filter(F.col("a") < F.col("b"))
            .select("a", "b", "sa", "sb").distinct())
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))
