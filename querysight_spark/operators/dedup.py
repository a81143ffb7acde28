"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Everything except SimHash stays in JVM-side built-in expressions (split /
transform / md5 / min / joins) — no Python on the hot path, full
whole-stage codegen. Hash functions are md5-hex-string based so the exact
same signatures are computable in any engine (the DuckDB oracle mirrors
them); min over hex strings = min over the 128-bit integer.

Scale notes (100 TB):
  * exact dedup: one hash-shuffle on md5(text) — optimal.
  * minhash: signatures are a narrow map-side projection; LSH banding turns
    the O(n²) pair space into per-bucket joins. Bucket skew (a viral
    boilerplate string) is the real-world hazard — AQE skew-join handles
    moderate cases; pathological buckets should be capped (documented).
  * n-gram Jaccard: the shingle-inverted-index join explodes on common
    shingles; at scale, drop shingles with doc_frequency above a cap
    (standard prefix-filtering) — exposed as ``max_shingle_df``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from querysight_spark.operators.parallel import floor_parallelism


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def _shingles(text_col: str, n: int):
    """Distinct word n-gram shingles, JVM-side.

    The outer ``transform(array(split(...)), w -> ...)[0]`` is a
    let-binding: it evaluates the split ONCE per row and names it ``w``.
    Without it, referencing ``split(text)`` inside the per-shingle lambda
    re-splits the text for every element — O(words²) string work per doc
    (observed 4.6 s vs 0.9 s to materialize the sf0.1 shingle index).
    Each shingle is assembled with element_at + concat_ws (no array
    slice/copy). Guarded so docs shorter than n yield an empty array
    (sequence(1,0) would count DOWN, not empty)."""
    parts = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    return F.expr(
        f"transform(array(split(`{text_col}`, ' ')), w -> "
        f"CASE WHEN size(w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(w) - {n} + 1), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array() END)[0]"
    )


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per duplicated content,
    with the keeper (min id) and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
    )


def exact_duplicate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b for every pair of rows sharing
    identical content — the pair-shaped companion to ``exact_duplicates``,
    emitted from per-hash posting lists (one shuffle, C(L,2) rows per
    group). ``max_group_size`` caps pathological groups the same way the
    LSH/shingle caps do."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    posting = hashed.groupBy("h").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )
    if max_group_size is not None:
        # r14: length gate on the built posting lists instead of a
        # count() window (the dd03/dd02 precedent) — drops the Window's
        # full Sort of the hashed stream; same exchange, same groups.
        # Buffer caveat (ADVICE r14): a viral group's full id array now
        # materializes in one in-heap collect_list buffer before the
        # gate drops it, where WindowExec buffered the same rows in a
        # SPILLABLE array — a pathological key degrades to disk there
        # but can OOM here. Acceptable for the content-hash key (group
        # size = exact-copy count, bounded by corpus duplication); for
        # a corpus where one blob has millions of exact copies,
        # pre-truncate with a two-phase count (groupBy.count -> anti-
        # join the viral keys) on a persisted hash stream instead.
        posting = posting.where(F.size("ids") <= max_group_size)
    return (
        posting.where(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("pr")
        )
        .select("pr.doc_a", "pr.doc_b")
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a duplicate-pair graph: every node gets
    ``cluster_id`` = the minimum id reachable through pairs — the step that
    turns pairwise near-dup evidence (dd01/dd02/dd03/dd06 outputs) into
    keep-one-per-cluster decisions.

    Min-label propagation: each round, every node takes the min of its own
    label and its neighbors' labels; converges in O(graph diameter) rounds.
    Duplicate graphs are near-cliques (diameter ≲ 3-4 even through chain
    bridges), so the loop runs a handful of rounds of one join + one
    groupBy each. Convergence is detected by counting rows whose label
    changed this round — type-agnostic (string or numeric ids; a sum-based
    signal returns NULL for non-numeric ids and can overflow long);
    ``localCheckpoint`` per round stops lineage/codegen growth, exactly as
    in the dbt closure fixpoint (plans/coverage.py). At 100 TB this is the
    textbook iterate-until-fixpoint CC; for adversarial long-path graphs
    swap in large-star/small-star — dup graphs are not that."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_label = F.least(F.col("label"), F.coalesce("nlabel", "label"))
        labels = (
            labels.join(neigh, labels["id"] == neigh["src"], "left")
            .select(
                labels["id"],
                new_label.alias("label"),
                (new_label != F.col("label")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = labels.agg(F.count(F.when(F.col("chg"), 1))).first()[0]
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, sig array<string>): sig[j] = min over shingles of
    md5(j || ':' || shingle). Engine-portable (md5-hex min) and fully
    JVM-side: explode → groupBy(id) with one min-agg per hash function.

    r15 MEASURED REVERSAL of the r14 per-row fold (guide §1: the
    "ideal" plan lost to the gotcha). r14 replaced this explode →
    groupBy with ``aggregate(_sh, ...)`` folds per slot — zero
    exchanges, zero sorts, local parity at sf0.1 — on the structural
    argument that min(string) plans as SortAggregate (no mutable agg
    buffer) and the sorted shingle stream is the term that grows.
    VERDICT r14 asked for proof at sf1; the interleaved A/B at the 10x
    fixture (tools/ab_scale_r15.py + the 3-variant isolation in
    OPTIMIZATION_r15.md) measured the fold 2.2–2.5× SLOWER end to end:
    higher-order functions are CodegenFallback, and the interpreted
    per-element lambda machinery (8 folds × accumulator rebinding per
    shingle) costs more than the SortAggregate's per-partition sort —
    whose input is reduced map-side by partial min to one row per doc
    before the exchange, and whose log-factor barely moves with corpus
    size at fixed partition sizes. 10x numbers (best/med, noop sink):
    explode 1.95/2.46 s, array_min(transform) 3.44/4.37 s, fold
    4.92/5.92 s — identical signatures asserted row-for-row for all
    three. So: explode it is, with the measurement committed."""
    # parallelism floor (round 14): on a narrow source (the driver's
    # 1-file tables scan as one partition) the shingle explode and the
    # num_hashes md5s per shingle — the query's dominant compute — run
    # on 1-2 cores and drift with scheduler noise (dd02 measured
    # 2.20 -> 1.14 s at sf0.1 with the floor; the moved bytes are just
    # (id, text)). No-op at 100 TB where file count >> cores.
    df = floor_parallelism(df)
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_size)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{j}") for j in range(num_hashes)]).alias("sig"),
    )


def banded_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    bands: int = 4,
) -> DataFrame:
    """LSH band keys (bid, band, key): the signature split into ``bands``
    bands of num_hashes/bands rows, each hashed to one key. Shared by the
    in-flight candidate generator and the persisted band index below —
    one construction, so index build and probe can never disagree on the
    hashing scheme."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", F.slice("sig", b * r + 1, r))).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col).alias("bid"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("bid", "bk.band", "bk.key")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    num_hashes/bands rows; docs sharing any band key are candidate
    duplicates. Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    Pairs come from per-(band, key) posting lists — the classic
    shingle→minhash→band→bucket pipeline, O(candidates) not O(n²): one
    groupBy builds the sorted doc list per bucket and a JVM-side nested
    ``transform`` emits the i<j pairs directly. One shuffle of the banded
    relation (a self-join needs two) and a single consumer, so no
    persist/cache is needed. Bucket posting lists are small by
    construction — banding exists to keep them so — which is what makes
    the collect_list safe here without a df cap.

    ``max_bucket_size`` drops pathological buckets (a viral boilerplate
    string hashing thousands of docs into one band key) before pair
    emission — at 100 TB one unbounded bucket is quadratic inside a single
    task, so the declared/bench paths set it; pairs whose every shared band
    is viral are the only ones lost."""
    banded = banded_keys(df, id_col, text_col, num_hashes, shingle_size, bands)
    posting = banded.groupBy("band", "key").agg(
        F.array_sort(F.collect_list("bid")).alias("ids")
    )
    if max_bucket_size is not None:
        # r14 (guide §2.4, the dd03 precedent): the cap is a length gate
        # on the posting lists the groupBy builds anyway — the previous
        # count() window needed a full Sort of the banded relation before
        # the exchange-sharing aggregation.
        # Buffer caveat (ADVICE r14): WindowExec buffered a viral
        # bucket's rows in a SPILLABLE array; collect_list builds the
        # bucket's id array in one in-heap buffer before the gate drops
        # it — a truly pathological band key (every doc sharing one
        # band) degrades to disk there but can OOM here. Band keys hash
        # 2 of 8 minhash slots, so a bucket that large means the corpus
        # is mostly one near-dup class; for that regime pre-truncate
        # with a two-phase count over a persisted banded stream rather
        # than trusting any in-aggregate cap.
        posting = posting.where(F.size("ids") <= max_bucket_size)
    return (
        posting.where(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("pr")
        )
        .select("pr.doc_a", "pr.doc_b")
        .distinct()
    )


def build_minhash_band_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> None:
    """Persist the base corpus's LSH band keys as a parquet posting-list
    index. This is the INCREMENTAL-dedup shape for a
    growing 100 TB corpus: signature the existing corpus once, then each
    ingest batch probes the index (see probe_minhash_band_index) instead of
    re-deduplicating the whole corpus — per-batch cost is O(delta), the
    corpus is touched only by the columnar index scan.

    ``max_bucket_size`` drops viral buckets at BUILD time (window count on
    the groupBy key, same trick as minhash_lsh_candidates), so every later
    probe inherits the cap without re-counting."""
    banded = banded_keys(df, id_col, text_col, num_hashes, shingle_size, bands)
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        banded = (
            banded.withColumn(
                "_bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
            )
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    # NOT partitioned by band: probes always touch every band, so band
    # dirs would buy no pruning — and an all-rows-capped (empty) index
    # must still write a schema-bearing file for later probes to read.
    banded.write.mode("overwrite").parquet(path)


def probe_minhash_band_index(
    spark,
    new_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Candidate duplicate pairs (doc_base, doc_new) between a persisted
    base-corpus band index and a new ingest batch: the delta's band keys
    (computed with the SAME banded_keys construction the index was built
    with) equi-join the posting lists on (band, key). The delta side is
    explicitly broadcast — a probe never shuffles the corpus-sized index,
    it streams it map-side against the in-memory batch keys. Intra-batch
    duplicates are minhash_lsh_candidates on the batch alone (compose the
    two for full coverage)."""
    from querysight_spark.sources.catalog import read_parquet_known_schema

    # r15: schema-memoized read — skips per-probe footer inference
    idx = read_parquet_known_schema(spark, path).select(
        F.col("bid").alias("doc_base"), "band", "key"
    )
    delta = banded_keys(
        new_df, id_col, text_col, num_hashes, shingle_size, bands
    ).select(F.col("bid").alias("doc_new"), "band", "key")
    return (
        idx.join(F.broadcast(delta), ["band", "key"])
        .select("doc_base", "doc_new")
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint: each word votes ±1 on ``bits`` bit positions
    (bit b of md5(word)); fingerprint bit = sign of the vote sum. Computed
    JVM-side: explode words → per-bit conditional sums → reassemble.

    Near-dup detection = grouping by fingerprint or hamming-distance
    banding; ``bits`` ≤ 32 keeps the vote columns cheap."""
    words = df.select(
        F.col(id_col), F.explode(F.array_distinct(_words(text_col))).alias("w")
    )
    # low 8 hex chars of md5 → 32-bit int; vote on its low `bits` bits
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    votes = words.select(F.col(id_col), *[
        F.when(F.shiftright(h, b).bitwiseAND(1) == 1, 1).otherwise(-1).alias(f"b{b}")
        for b in range(bits)
    ])
    sums = votes.groupBy(id_col).agg(*[F.sum(f"b{b}").alias(f"s{b}") for b in range(bits)])
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") > 0, 1 << b).otherwise(0)
        fp = bit if fp is None else (fp + bit)
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    hash_shingles: bool = True,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via a shingle inverted index:
    explode shingles → self-join on shingle → |A∩B| per pair →
    jaccard = inter / (|A| + |B| - inter).

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    before the pair join (prefix filtering) — at 100 TB this is what keeps
    stop-phrase shingles from exploding the join; it changes results only
    for pairs whose entire overlap is stop-phrases.

    The shingle inverted index feeds three consumers (per-doc sizes and
    both self-join sides), so it is persisted once — without this, the
    string-heavy shingling recomputes per branch (observed 8 source scans
    for one query). At 100 TB, write the index to a temp parquet table
    instead of caching (same plan shape, executor-memory-independent).

    ``hash_shingles`` (default) joins on ``xxhash64(shingle)`` instead of
    the shingle string — 2× faster shuffle/compare (measured at sf0.1). A
    64-bit collision could perturb one intersection count; with d distinct
    shingles P ≈ d²/2⁶⁵ (~1e-11 at 10⁴·⁵, ~3% only past 10⁹ distinct
    shingles, and even then jaccard moves by 1/|union|). Set False for the
    strictly-exact string join.

    Pair generation is posting-list style: one groupBy(shingle) builds the
    sorted doc list per shingle, then a JVM-side nested ``transform`` emits
    exactly the i<j pairs — one shuffle of the index instead of the two a
    self-join needs, and L(L-1)/2 rows per posting list instead of the L²
    candidates a join filters down. Posting-list length is the skew knob:
    ``max_shingle_df`` becomes a plain ``size(ids) <= k`` filter (no extra
    aggregation pass), and at 100 TB it is mandatory — an unbounded
    stop-phrase posting list is quadratic in one task either way, but here
    it is also one driver-visible array."""
    # parallelism floor (round 14): the shingle explode + xxhash64 that
    # builds the persisted index is the compute-heavy stage; on a
    # narrow source it runs on 1-2 cores (dd03 2.45 -> 1.93 s at sf0.1
    # with the floor). No-op where file count >= cores.
    df = floor_parallelism(df)
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_size)).alias("sh")
    )
    if hash_shingles:
        sh = sh.select(F.col(id_col), F.xxhash64("sh").alias("sh"))
    # r15 (VERDICT r14 ask #7): localCheckpoint instead of persist — the
    # blocks release when the result frame is dropped (ContextCleaner on
    # the checkpoint RDD) instead of accumulating in the session cache
    # manager across repeated calls; same one-materialization plan shape
    # (the tx21/remove_duplicate_spans precedent, r4 ADVICE finding).
    sh = sh.localCheckpoint(eager=True)
    # sizes feeds BOTH sides of the final sa/sb join — materialize the
    # doc-sized agg so the shingle index is re-scanned once, not twice
    # (r14 opt, guide §2.4; one pass saved over the index per call)
    sizes = (
        sh.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("sz"))
        .localCheckpoint(eager=True)
    )
    # Prefix filtering as a plain length gate on the BUILT posting lists
    # (r14 opt, guide §2.4): per-doc shingles are distinct by
    # construction (``_shingles`` wraps array_distinct), so the per-row
    # document frequency the old ``count() OVER (PARTITION BY sh)``
    # computed is exactly ``size(ids)`` of the list the very next
    # operator built — the Window (and its full-index Sort) bought
    # nothing. Same single exchange (the groupBy), and the size gate
    # runs BEFORE the array_sort so stop-phrase lists are dropped
    # unsorted. Doc sizes stay computed from the UNCAPPED index
    # (standard prefix-filtering semantics).
    # Buffer caveat (ADVICE r14): a stop-phrase shingle's full posting
    # list materializes in one in-heap collect_list buffer before the
    # gate drops it (WindowExec's buffer was spillable) — fine while
    # posting lists are bounded by max_shingle_df-scale skew, but a
    # shingle shared by a significant fraction of a 100 TB corpus
    # should be pre-truncated by a two-phase count on the persisted
    # shingle index (one extra pass over `sh`, which this function
    # already materializes) rather than gated post-aggregation.
    posting = sh.groupBy("sh").agg(F.collect_list(id_col).alias("ids_raw"))
    lo, hi = 2, max_shingle_df if max_shingle_df is not None else None
    posting = posting.where(
        F.size("ids_raw") >= lo
        if hi is None
        else F.size("ids_raw").between(lo, hi)
    ).select("sh", F.array_sort("ids_raw").alias("ids"))
    pairs = posting.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(x AS ia, y AS ib))))"
            )
        ).alias("pr")
    )
    inter = (
        pairs.select("pr.ia", "pr.ib")
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("ia"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("ib"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "ia")
        .join(sb, "ib")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"), "jaccard"
        )
    )


def embedding_cosine_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_size: int = 2048,
    expected_n: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: exact cosine similarity over all (a<b)
    pairs, executed as a BLOCK-NESTED-LOOP with numpy GEMM.

    ``expected_n`` sizes the block grid without running a count job — any
    row-count estimate (parquet footer metadata, catalog stats) works,
    since a high estimate only makes blocks smaller and a low one larger;
    when omitted, an exact ``df.count()`` job runs first.

    Vectors are hash-assigned to ⌈n/block_size⌉ blocks; blocks self-join on
    ``bid_a <= bid_b`` so every unordered pair of vectors lands in exactly
    one block-pair task, and each task computes its block×block cosine
    matrix with one float64 matmul inside mapInPandas (Arrow batches, BLAS
    kernels) — orders of magnitude faster than per-pair expression
    evaluation, with per-task memory bounded by block_size² doubles.

    Scale: work is inherently O(n²·d) — exact all-pairs is the CORRECTNESS
    baseline; at 100 TB restrict the pair space first (similarity.bucket_ids
    LSH prefilter, or minhash bands for text). Shuffle volume is
    n·⌈n/block_size⌉ vector replicas, tunable via block_size; tasks are
    uniform (hash blocking) so there is no skew straggler.

    Numeric note: the cosine matrix divides the GEMM dot by the norm
    product, rounds at 6 decimals, THEN thresholds — same discipline as the
    DuckDB oracle; float64 matmul-vs-sequential accumulation differences
    are ~1e-14, far below the rounding grain."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    n = expected_n if expected_n is not None else df.count()
    n_blocks = max(1, math.ceil(n / block_size))
    id_type = df.schema[id_col].dataType

    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_bid"),
    )
    blocks = v.groupBy("_bid").agg(
        F.collect_list("_id").alias("_ids"), F.collect_list("_v").alias("_vecs")
    )
    a = blocks.select(
        F.col("_bid").alias("bid_a"),
        F.col("_ids").alias("ids_a"),
        F.col("_vecs").alias("vecs_a"),
    )
    b = blocks.select(
        F.col("_bid").alias("bid_b"),
        F.col("_ids").alias("ids_b"),
        F.col("_vecs").alias("vecs_b"),
    )
    pairs = a.join(b, F.col("bid_a") <= F.col("bid_b"))

    out_schema = StructType(
        [
            StructField("vec_a", id_type),
            StructField("vec_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(list(row.ids_a))
                ids_b = np.asarray(list(row.ids_b))
                A = np.array([np.asarray(x) for x in row.vecs_a], dtype=np.float64)
                B = np.array([np.asarray(x) for x in row.vecs_b], dtype=np.float64)
                if A.size == 0 or B.size == 0:
                    continue
                cos = (A @ B.T) / np.outer(
                    np.sqrt((A * A).sum(axis=1)), np.sqrt((B * B).sum(axis=1))
                )
                cos = np.round(cos, 6)
                if row.bid_a == row.bid_b:
                    ii, jj = np.triu_indices(len(ids_a), k=1)
                else:
                    ii, jj = np.indices((len(ids_a), len(ids_b)))
                    ii, jj = ii.ravel(), jj.ravel()
                keep = cos[ii, jj] >= threshold
                ii, jj = ii[keep], jj[keep]
                if len(ii) == 0:
                    continue
                ia, ib = ids_a[ii], ids_b[jj]
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                yield pd.DataFrame(
                    {"vec_a": lo, "vec_b": hi, "cosine": cos[ii, jj]}
                )

    return pairs.mapInPandas(compute, schema=out_schema)


def embedding_cosine_duplicates_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    block_size: int = 2048,
) -> DataFrame:
    """Scale-safe embedding near-dup pairs: sign-LSH bucket prefilter, then
    exact blocked-GEMM cosine WITHIN each bucket — the declared 100 TB path
    (``embedding_cosine_duplicates`` stays as the exact all-pairs oracle
    baseline; see VERDICT.md round 1).

    Pair space is ``n_tables`` INDEPENDENT hash tables of ``bits``
    hyperplanes each (the L×k banding structure, same shape as MinHash
    bands): a vector lands in one bucket per table, pairs are generated
    within buckets, and ``distinct`` collapses pairs found in several
    tables. Verbatim duplicates hash identically in every table → recall
    1.0 by construction. A cosine-t pair disagrees with a given hyperplane
    w.p. p = arccos(t)/π (~10 % at t=0.95), so recall =
    1-(1-(1-p)^bits)^n_tables (~0.90 at the defaults) — raise ``n_tables``
    for recall, ``bits`` for speed. Expected pair-work is
    n²·L/2^(k+1) versus the exact path's n²/2 — ÷128 at the defaults —
    and the flip-replication alternative (r=k+1 copies into ONE table) is
    strictly worse: its r² cost factor exceeds its 2^k reduction until k≫8.

    One shuffle (groupBy table#bucket), Arrow-batched numpy GEMM inside
    (tile memory bounded by ``block_size²`` doubles), cosine rounded at 6
    digits BEFORE thresholding so replica pairs agree bit-for-bit and the
    result is comparable to the exact baseline. Bucketing is ONE Arrow-
    batched matmul against the stacked (L·k)×dim plane matrix — expressing
    the L·k hyperplane dots as unrolled codegen was measured 10× slower
    (the generated method blows past JIT limits at L·k·dim ≈ 2048 terms)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, StructField, StructType

    from querysight_spark.operators.similarity import hyperplanes
    from querysight_spark.operators.vectors import as_double

    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0]) if first and first[0] is not None else 0
    id_type = df.schema[id_col].dataType

    P = np.vstack(
        [hyperplanes(dim, bits, seed + 7919 * t) for t in range(n_tables)]
    )  # (L·k) × dim
    weights = 1 << np.arange(bits)

    @pandas_udf("array<string>")
    def table_buckets(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        S = (X @ P.T) >= 0  # n × (L·k) sign matrix, one BLAS call
        codes = [
            (S[:, t * bits : (t + 1) * bits] * weights).sum(axis=1)
            for t in range(n_tables)
        ]
        return pd.Series(
            [[f"{t}#{codes[t][i]}" for t in range(n_tables)] for i in range(len(X))]
        )

    v = df.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v"))
    rep = v.select(
        "_id", "_v", F.explode(table_buckets(F.col("_v"))).alias("_bkt")
    )

    out_schema = StructType(
        [
            StructField("vec_a", id_type),
            StructField("vec_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=ids.dtype),
                    "vec_b": pd.Series([], dtype=ids.dtype),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        V = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        frames = []
        for i0 in range(0, n, block_size):
            A = V[i0 : i0 + block_size]
            for j0 in range(i0, n, block_size):
                B = V[j0 : j0 + block_size]
                cos = np.round(
                    (A @ B.T)
                    / np.outer(norms[i0 : i0 + block_size], norms[j0 : j0 + block_size]),
                    6,
                )
                if i0 == j0:
                    ii, jj = np.triu_indices(len(A), k=1)
                else:
                    ii, jj = np.indices((len(A), len(B)))
                    ii, jj = ii.ravel(), jj.ravel()
                keep = cos[ii, jj] >= threshold
                ii, jj = ii[keep], jj[keep]
                if len(ii) == 0:
                    continue
                ia, ib = ids[i0 + ii], ids[j0 + jj]
                lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
                frames.append(
                    pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": cos[ii, jj]})
                )
        if not frames:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=ids.dtype),
                    "vec_b": pd.Series([], dtype=ids.dtype),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return rep.groupBy("_bkt").applyInPandas(score, schema=out_schema).distinct()


def embedding_cosine_duplicates_expr(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Pure-expression variant of embedding_cosine_duplicates (no Python
    workers): unrolled codegen dot product over the self-join pair space.
    Kept as the Arrow-free fallback and as the semantic reference for the
    blocked-GEMM path — both produce identical rows."""
    from querysight_spark.operators.vectors import as_double, dot, norm

    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0]) if first and first[0] is not None else None
    _dot = lambda a, b: dot(a, b, dim)  # noqa: E731
    v = df.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("norm", norm(F.col("v"), dim))
    a = v.select(F.col(id_col).alias("ida"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col(id_col).alias("idb"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    return (
        pairs.withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("cosine") >= threshold)
        .select(F.col("ida").alias("vec_a"), F.col("idb").alias("vec_b"), "cosine")
    )


def cluster_keep_best(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col=None,
    text_col: str = "text",
) -> DataFrame:
    """One keeper per duplicate CLUSTER (the multi-hop companion to
    textstats.dedupe_keep_best, which keys on exact content): join docs to
    their ``duplicate_clusters`` labels — docs with no pair evidence keep
    themselves — and keep the highest-scoring member per cluster
    (default score: text length; id as the deterministic tie-break).
    One broadcast-or-shuffled join + one window over cluster_id; cluster
    count ≪ corpus, so the window partitions are the small side."""
    from pyspark.sql.window import Window

    score = score_col if score_col is not None else F.length(F.col(text_col))
    labeled = df.join(clusters, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )
    w = Window.partitionBy("cluster_id").orderBy(score.desc(), F.col(id_col))
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Estimator-quality surface for the MinHash pipeline: for every LSH
    candidate pair, the signature-agreement Jaccard ESTIMATE
    (matching positions / num_hashes — the quantity MinHash exists to
    approximate) next to the TRUE shingle Jaccard, plus the absolute
    error. Everything is md5-deterministic, so the whole comparison is
    oracle-exact, not merely self-checked.

    Plan: candidate pairs from the banded index (never all pairs), one
    signature join per side, and per-doc distinct-shingle ARRAYS joined
    to the pairs — array_intersect beats a shingle-level join here
    because the pair list is already small and shingle sets are bounded
    by doc length."""
    pairs = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, shingle_size, bands, max_bucket_size
    )
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    sh = df.select(
        F.col(id_col), _shingles(text_col, shingle_size).alias("shingles")
    )
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    ha = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    hb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    j = pairs.join(sa, "doc_a").join(sb, "doc_b").join(ha, "doc_a").join(hb, "doc_b")
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return j.select(
        "doc_a",
        "doc_b",
        F.round(matches / F.lit(num_hashes), 6).alias("est_jaccard"),
        F.round(inter / union, 6).alias("true_jaccard"),
        F.round(
            F.abs(matches / F.lit(num_hashes) - inter / union), 6
        ).alias("abs_err"),
    )


# Measured exact-vs-LSH crossover (SCALE.md, r5 vintage curve): exact
# blocked GEMM wins below ~1e5 vectors (LSH pays fixed per-table
# overhead), LSH wins above (exact's pair space is quadratic). The
# boundary is flat — both paths are within ~2x of each other for a
# decade around it — so a footer-estimate is plenty of precision.
COSINE_AUTO_CROSSOVER = 100_000


def embedding_cosine_duplicates_auto(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    expected_n: int | None = None,
    crossover: int = COSINE_AUTO_CROSSOVER,
    **lsh_kwargs,
) -> DataFrame:
    """Cosine near-dup pairs with the plan picked FOR the caller
    (round-6 continuity item #4): exact all-pairs blocked GEMM below
    ``crossover`` vectors, sign-LSH bucket prefilter above — the
    measured ~1e5 boundary from SCALE.md's growth curves, so callers get
    the right plan without reading that file. ``expected_n`` accepts any
    row-count estimate (parquet footer metadata, catalog stats); when
    omitted one count job runs — the same estimate then sizes the exact
    path's block grid, so nothing is counted twice. Note the two paths
    are NOT row-identical in general (LSH recall < 1 for borderline
    pairs below ~0.99 cosine); dd06's equality-to-exact holds for its
    near-verbatim duplicate construction, which is the dedup use case."""
    n = expected_n if expected_n is not None else df.count()
    if n <= crossover:
        return embedding_cosine_duplicates(
            df, id_col, vec_col, threshold, expected_n=n
        )
    return embedding_cosine_duplicates_lsh(
        df, id_col, vec_col, threshold, **lsh_kwargs
    )
