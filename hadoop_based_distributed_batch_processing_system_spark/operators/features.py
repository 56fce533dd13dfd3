"""Feature-engineering operators — the tabular/vector prep steps a
training-data pipeline runs between raw corpus and model input
(SURVEY.md §2.11 north-star extensions; the reference class has no
feature layer, so these are mandated by the LLM-pipeline extension
goal, not reconstructed).

Design rules shared by the module:
- portable hashing only (md5 nibble arithmetic — identical in every
  engine), never engine-internal hashes, so every operator here is
  hash-oracle-checkable;
- model-state aggregates (per-dimension stats, per-category means)
  stay bounded by #dimensions or #categories and are broadcast back,
  never shuffling the corpus a second time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

_HASH_DIM = 32  # feature-hashing bucket count
_TE_SMOOTH = 10.0  # target-encoding smoothing pseudo-count
_EMB_DIM = 64

# md5 hex nibble -> value, the engine-portable hash primitive
# (Spark `instr` == DuckDB `strpos`, 1-based; -1 shifts to 0-based).
_NIBBLE_SPARK = "(instr('0123456789abcdef', substr(md5(token), {pos}, 1)) - 1)"
_NIBBLE_DUCK = "(strpos('0123456789abcdef', substr(md5(token), {pos}, 1)) - 1)"


@register(
    "feature_hashing",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents
        ),
        tb AS (
          SELECT doc_id,
                 CAST((16 * {_NIBBLE_DUCK.format(pos=1)}
                       + {_NIBBLE_DUCK.format(pos=2)}) % {_HASH_DIM} AS BIGINT) AS bucket
          FROM tok
        ),
        bl AS (SELECT doc_id, list(bucket) AS blist FROM tb GROUP BY doc_id)
        SELECT doc_id,
               array_to_string(
                 list_transform(generate_series(0, {_HASH_DIM - 1}),
                                i -> CAST(len(list_filter(blist, x -> x = i)) AS BIGINT)),
                 ',') AS features
        FROM bl
    """,
    tags=("L16", "features", "hashing-trick"),
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: each document's tokens are hashed
    into a fixed 32-bucket count vector — the bounded-vocabulary text
    representation (no vocab build, no OOV, memory independent of
    corpus size) that linear models / quick-quality classifiers train
    on. The bucket hash is portable md5 nibble arithmetic, so the
    whole vector is engine-exact and hash-oracled. The vector is
    emitted as a comma-joined string: the driver's result
    canonicalizer cannot hash list-typed cells (CORRECTNESS_r01's
    agg_collect error), so no registered query returns a complex
    top-level column (test_no_complex_toplevel_output_types).

    Scale: tokenize+bucket is a narrow map; the single shuffle
    carries (doc_id, tiny-int bucket) pairs; per-doc assembly is a
    bounded 32-slot fold. At 100 TB the shuffle is the token count ×
    ~12 bytes — the same cost class as wordcount, with the vector
    assembly free of any vocabulary-sized state."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    bucket = F.expr(
        f"CAST((16 * {_NIBBLE_SPARK.format(pos=1)} + {_NIBBLE_SPARK.format(pos=2)}) % {_HASH_DIM} AS BIGINT)"
    )
    per_doc = tokens.select("doc_id", bucket.alias("bucket")).groupBy("doc_id").agg(
        F.collect_list("bucket").alias("blist")
    )
    return per_doc.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.expr(
                f"transform(sequence(0, {_HASH_DIM - 1}),"
                " i -> CAST(size(filter(blist, x -> x = CAST(i AS BIGINT))) AS BIGINT))"
            ),
        ).alias("features"),
    )


@register(
    "target_encoding_loo",
    oracle=f"""
        WITH g AS (SELECT AVG(value) AS gmean FROM events),
        stats AS (
          SELECT event_id, user_id, event_type, value,
                 SUM(value) OVER (PARTITION BY event_type) AS s,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_id, user_id, event_type,
               ROUND((s - value + {_TE_SMOOTH} * g.gmean) / (n - 1 + {_TE_SMOOTH}), 6)
                 AS te_value
        FROM stats, g
    """,
    tags=("L17", "features", "target-encoding"),
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of a categorical column
    (event_type, target = value): each row's encoding is the
    smoothed mean of its category EXCLUDING the row itself —
    (S - y) / (n - 1) blended toward the global mean with 10
    pseudo-counts — the standard leakage-safe categorical feature
    for tabular models. The own-row exclusion is why this is a
    window op, not a join: per-category totals via one window (a
    single shuffle on event_type), global mean broadcast as a 1-row
    cross join (never a partition-all window).

    Scale: the shuffle is the fact table once, keyed by the
    low-cardinality category — exactly an agg_group shuffle; the
    global mean is O(1) driver state. Skewed categories behave like
    any skewed groupBy (AQE split); no per-category state exceeds a
    running sum."""
    ev = load_table(spark, sf_dir, "events")
    gmean = ev.agg(F.avg("value").alias("gmean"))
    w = Window.partitionBy("event_type")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .withColumn("s", F.sum("value").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(gmean))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(
                (F.col("s") - F.col("value") + _TE_SMOOTH * F.col("gmean"))
                / (F.col("n") - 1 + _TE_SMOOTH),
                6,
            ).alias("te_value"),
        )
    )


@register(
    "embed_standardize",
    oracle=f"""
        WITH s AS (
          SELECT i, AVG(CAST(embedding AS DOUBLE[])[i]) AS mu,
                 STDDEV_POP(CAST(embedding AS DOUBLE[])[i]) AS sd
          FROM embeddings, LATERAL unnest(generate_series(1, {_EMB_DIM})) AS t(i)
          GROUP BY i
        ),
        packed AS (
          SELECT list(mu ORDER BY i) AS mus, list(sd ORDER BY i) AS sds FROM s
        )
        SELECT vec_id,
               array_to_string(
                 list_transform(generate_series(1, {_EMB_DIM}),
                   i -> CAST(CAST(ROUND(
                          ROUND((CAST(embedding AS DOUBLE[])[i] - mus[i]) / sds[i], 6)
                          * 1000000, 0) AS BIGINT) AS VARCHAR)),
                 ',') AS z
        FROM embeddings, packed
    """,
    tags=("L13'''", "features", "scaler"),
)
def embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding column
    (StandardScaler): the preprocessing step before distance-based
    anything (k-means, cosine ANN on non-normalized spaces, linear
    probes). Two-phase: 64 mean/stddev_pop pairs in ONE aggregate
    pass (128 mergeable moments — map-side partials, 1-row result),
    broadcast back, then a pure JVM zip_with transform per row.

    Scale: the stats pass shuffles 128 doubles; the transform is a
    zero-shuffle narrow map. The model state (mu/sigma arrays) is
    O(dims) driver bytes at any corpus size — the same
    bounded-model-state discipline as sim_search_ann_ivf's
    centroids."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    )
    stats = emb.agg(
        F.array(*[F.avg(F.col("v")[i]) for i in range(_EMB_DIM)]).alias("mus"),
        F.array(*[F.stddev_pop(F.col("v")[i]) for i in range(_EMB_DIM)]).alias("sds"),
    )
    return (
        emb.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            # 6-dp fixed-point integers joined to one string: the z
            # values round to 6 dp first (so the fixed-point scale is
            # exact-adjacent to an integer), then scale — the
            # driver-canonicalizer-safe vector representation.
            F.concat_ws(
                ",",
                F.expr(
                    f"transform(sequence(1, {_EMB_DIM}),"
                    " i -> CAST(CAST(ROUND(ROUND((v[i - 1] - mus[i - 1]) / sds[i - 1], 6)"
                    " * 1000000, 0) AS BIGINT) AS STRING))"
                ),
            ).alias("z"),
        )
    )


@register(
    "user_rfm_segments",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 MAX(ts) AS last_ts,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6)
                   AS monetary
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               ntile(5) OVER (ORDER BY last_ts, user_id) AS r_score,
               ntile(5) OVER (ORDER BY n_events, user_id) AS f_score,
               ntile(5) OVER (ORDER BY monetary, user_id) AS m_score,
               n_events, monetary
        FROM u
    """,
    tags=("E5", "features", "rfm"),
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: per-user recency (last event time),
    frequency (event count) and monetary (purchase value) collapse to
    1-5 quintile scores — the classic behavioral segmentation grid
    (5/5/5 = best customers). Quintiles via ntile(5) with user_id as
    the deterministic tiebreak, so both engines assign identical
    buckets.

    Scale: the fact table is reduced FIRST by a user-keyed aggregate;
    each quintile then comes from the two-phase bucketed global
    numbering (the bucketed_rank_cumsum recipe, sorts.py), never a
    single-partition ntile window — FUSED across the three metrics so
    the whole operator runs three driver-bounded jobs, not nine: ONE
    agg fetches min/max of all metrics, ONE GROUPING SETS pass counts
    all three bucketings (≤ 3×32 rows to the driver), and the three
    per-bucket rank windows chain inside the final job. ntile is a
    pure function of (global rank, total count): with q = n div 5,
    r = n mod 5, the first r tiles hold q+1 rows — exactly SQL
    ntile's fill rule, so the distributed form is bit-identical to
    the window (ranks are exact integers). Per-task memory = one
    rank bucket."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 6
        ).alias("monetary"),
    ).withColumn("last_ts_us", F.unix_micros("last_ts"))
    u = u.cache()

    metrics = [("last_ts_us", "r_score"), ("n_events", "f_score"), ("monetary", "m_score")]
    n_buckets = 32
    bounds = u.agg(
        *[f(c) for c, _ in metrics for f in (F.min, F.max)]
    ).first()

    def bucket_expr(col: str, lo, hi):
        span = float(hi) - float(lo)
        width = (span / n_buckets) if span > 0 else 1.0
        raw = (F.col(col) - F.lit(float(lo))) / F.lit(width)
        return F.least(F.floor(raw), F.lit(n_buckets - 1)).cast("int")

    bcols = [f"__b_{s}" for _, s in metrics]
    bucketed = u
    for i, (c, _s) in enumerate(metrics):
        bucketed = bucketed.withColumn(bcols[i], bucket_expr(c, bounds[2 * i], bounds[2 * i + 1]))
    # one shuffle counts all three bucketings at once (3 × ≤32 rows back)
    stats = (
        bucketed.groupingSets([[b] for b in bcols], *[F.col(b) for b in bcols])
        .count()
        .collect()
    )
    offsets: list[dict[int, int]] = [{}, {}, {}]
    for i in range(3):
        acc = 0
        per = sorted((r[bcols[i]], r["count"]) for r in stats if r[bcols[i]] is not None)
        for bkt, c in per:
            offsets[i][bkt] = acc
            acc += c
    n_total = sum(r["count"] for r in stats if r[bcols[0]] is not None)

    def ntile_of(rn, n: int, tiles: int = 5):
        # SQL ntile's fill rule as a pure function of global rank: with
        # q = n div tiles and r = n mod tiles, the first r tiles hold
        # q+1 rows. Ranks are exact longs far below 2^53, so the
        # correctly-rounded double division can't cross an integer
        # boundary before floor.
        q, r = divmod(n, tiles)
        head = r * (q + 1)
        if q == 0:
            return rn.cast("int")
        return (
            F.when(rn <= head, F.floor((rn - 1) / F.lit(q + 1)))
            .otherwise(F.lit(r) + F.floor((rn - head - 1) / F.lit(q)))
            + 1
        ).cast("int")

    scored = bucketed
    for i, (order_col, score_name) in enumerate(metrics):
        # offsets as ONE array literal indexed by bucket id — a
        # create_map of 2×32 literal children is rebuilt PER ROW by
        # codegen (measured ~20% of the final job at sf0.1), while
        # F.lit(list) folds to a single Literal evaluated once.
        off_arr = F.lit([int(offsets[i].get(b, 0)) for b in range(n_buckets)])
        w = Window.partitionBy(bcols[i]).orderBy(F.asc(order_col), F.asc("user_id"))
        rn = (F.row_number().over(w) + F.element_at(off_arr, F.col(bcols[i]) + 1)).cast(
            "long"
        )
        scored = scored.withColumn(score_name, ntile_of(rn, n_total))
    return scored.select("user_id", "r_score", "f_score", "m_score", "n_events", "monetary")


_STUMP_FEATURES = (
    # (name, integer-bin expression over lineitem — identical text in
    # both engines so bin assignment is bit-identical)
    ("price_10k", "CAST(floor(l_extendedprice / 10000) AS INT)"),
    ("discount_pct", "CAST(round(l_discount * 100) AS INT)"),
    ("tax_pct", "CAST(round(l_tax * 100) AS INT)"),
)
_STUMP_TARGET = "l_quantity > 25"


def _stump_oracle() -> str:
    feats = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS bin, y FROM base" for name, expr in _STUMP_FEATURES
    )
    return f"""
        WITH base AS (
          SELECT l_extendedprice, l_discount, l_tax,
                 CASE WHEN {_STUMP_TARGET} THEN 1 ELSE 0 END AS y
          FROM lineitem
        ),
        fb AS ({feats}),
        hist AS (
          SELECT feature, bin, COUNT(*) AS n, SUM(y) AS pos
          FROM fb GROUP BY feature, bin
        ),
        cum AS (
          SELECT feature, bin,
                 SUM(n) OVER w AS n_left, SUM(pos) OVER w AS pos_left,
                 SUM(n) OVER p AS n_tot, SUM(pos) OVER p AS pos_tot
          FROM hist
          WINDOW w AS (PARTITION BY feature ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 p AS (PARTITION BY feature)
        ),
        cand AS (
          SELECT feature, bin AS split_bin,
                 CAST(n_left AS BIGINT) AS n_left,
                 CAST(pos_left AS BIGINT) AS pos_left,
                 CAST(n_tot - n_left AS BIGINT) AS n_right,
                 CAST(pos_tot - pos_left AS BIGINT) AS pos_right,
                 -- + 0.0 normalizes a rounded -0.0 to +0.0 so the
                 -- DESC argmax ordering agrees with Spark's struct-min
                 ROUND(
                   (1.0 - (pos_tot * pos_tot + (n_tot - pos_tot) * (n_tot - pos_tot))
                        / (1.0 * n_tot * n_tot))
                   - (n_left * (1.0 - (pos_left * pos_left
                        + (n_left - pos_left) * (n_left - pos_left))
                        / (1.0 * n_left * n_left))
                      + (n_tot - n_left) * (1.0 - ((pos_tot - pos_left) * (pos_tot - pos_left)
                        + ((n_tot - n_left) - (pos_tot - pos_left))
                          * ((n_tot - n_left) - (pos_tot - pos_left)))
                        / (1.0 * (n_tot - n_left) * (n_tot - n_left)))) / n_tot,
                 6) + 0.0 AS gain
          FROM cum
          WHERE n_left > 0 AND n_tot - n_left > 0
        ),
        best AS (
          SELECT feature, split_bin FROM cand
          ORDER BY gain DESC, feature, split_bin LIMIT 1
        )
        SELECT c.feature, c.split_bin, c.n_left, c.pos_left, c.n_right, c.pos_right,
               c.gain,
               (c.feature = b.feature AND c.split_bin = b.split_bin) AS is_best
        FROM cand c, best b
    """


@register(
    "ml_decision_stump",
    oracle=_stump_oracle(),
    tags=("ML5", "tree", "stump", "histogram"),
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML5 — distributed DECISION-STUMP training by histogram split
    finding: the depth-1 CART tree, and more importantly THE split
    primitive every histogram GBDT (LightGBM/XGBoost-hist) runs per
    node — fifth ML flagship beside k-means / logreg / PCA / BPE.
    Target: is this a bulk line (l_quantity > 25)? Features: integer
    bins of extendedprice / discount / tax. For every (feature,
    boundary) candidate, the exact left/right class counts and the
    Gini impurity decrease; ``is_best`` marks the argmax split
    (round-6dp gain, then (feature, bin) tiebreak — the
    round-before-argmax discipline).

    Scale — the histogram trick verbatim: the corpus is scanned ONCE
    (one generator explode into (feature, bin, y)), then ONE
    map-side-combining aggregate leaves #features × #bins rows (~70
    here; bounded by construction, never by data). Split evaluation
    is a prefix-scan window over those bounded histogram rows and
    the argmax rides back as a broadcast 1-row scalar join —
    at 100 TB the only corpus-sized work is the single scan, exactly
    why every production GBDT bins first. Gini arithmetic runs on
    exact BIGINT counts with the identical expression text in both
    engines; ROUND 6dp absorbs last-ulp double division drift."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.expr(f"CASE WHEN {_STUMP_TARGET} THEN 1 ELSE 0 END").alias("y"),
        *[F.expr(expr).alias(name) for name, expr in _STUMP_FEATURES],
    )
    fb = base.select(
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("feature"), F.col(name).alias("bin"))
                    for name, _ in _STUMP_FEATURES
                ]
            )
        ).alias("fb"),
    ).select(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "y")
    hist = fb.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        F.col("bin").alias("split_bin"),
        F.sum("n").over(w).alias("n_left"),
        F.sum("pos").over(w).alias("pos_left"),
        F.sum("n").over(p).alias("n_tot"),
        F.sum("pos").over(p).alias("pos_tot"),
    )
    # 1.0D, not 1.0: a bare 1.0 literal parses as DECIMAL(2,1) in Spark
    # SQL and drags the whole gain into decimal arithmetic — the driver
    # hashes the SERIALIZED cell, so Decimal('0.000006') != 6e-06 even
    # though the loose numeric compare passes (r09 hash FAIL). Double
    # literals keep the arithmetic in IEEE double exactly like DuckDB's.
    # The trailing + 0.0D collapses a rounded -0.0 to +0.0 so the
    # struct-min argmax (which would order -0.0 before 0.0 — Spark has
    # no NormalizeFloatingNumbers on min) matches the oracle's DESC sort.
    gain = F.expr(
        """
        ROUND(
          (1.0D - (pos_tot * pos_tot + (n_tot - pos_tot) * (n_tot - pos_tot))
               / (1.0D * n_tot * n_tot))
          - (n_left * (1.0D - (pos_left * pos_left
               + (n_left - pos_left) * (n_left - pos_left))
               / (1.0D * n_left * n_left))
             + (n_tot - n_left) * (1.0D - ((pos_tot - pos_left) * (pos_tot - pos_left)
               + ((n_tot - n_left) - (pos_tot - pos_left))
                 * ((n_tot - n_left) - (pos_tot - pos_left)))
               / (1.0D * (n_tot - n_left) * (n_tot - n_left)))) / n_tot,
        6) + 0.0D
        """
    )
    cand = (
        cum.filter((F.col("n_left") > 0) & (F.col("n_tot") - F.col("n_left") > 0))
        .select(
            "feature",
            "split_bin",
            F.col("n_left").cast("long").alias("n_left"),
            F.col("pos_left").cast("long").alias("pos_left"),
            (F.col("n_tot") - F.col("n_left")).cast("long").alias("n_right"),
            (F.col("pos_tot") - F.col("pos_left")).cast("long").alias("pos_right"),
            gain.alias("gain"),
        )
        # two consumers (the argmax aggregate + the output projection)
        # — uncached, each re-runs the corpus scan + histogram, i.e.
        # TWO full scans at 100 TB for a #features×#bins-row frame.
        # Cache the bounded frame; ContextCleaner reclaims it.
        .cache()
    )
    best = cand.agg(
        F.min(
            F.struct(
                (-F.col("gain")).alias("ng"),
                F.col("feature").alias("bf"),
                F.col("split_bin").alias("bb"),
            )
        ).alias("b")
    )
    return cand.crossJoin(F.broadcast(best)).select(
        "feature", "split_bin", "n_left", "pos_left", "n_right", "pos_right", "gain",
        ((F.col("feature") == F.col("b.bf")) & (F.col("split_bin") == F.col("b.bb"))).alias(
            "is_best"
        ),
    )


_WOE_PRICE_BIN = 62500  # fixed-width o_totalprice bins: 0..500k -> 8 buckets
_WOE_PRICE_CAP = 7


@register(
    "feature_woe_iv",
    oracle=f"""
        WITH base AS (
          SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END AS y,
                 c.c_mktsegment AS seg,
                 CAST(LEAST(CAST(FLOOR(o.o_totalprice / {_WOE_PRICE_BIN}) AS BIGINT),
                            {_WOE_PRICE_CAP}) AS VARCHAR) AS pb
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        binned AS (
          SELECT 'mktsegment' AS feature, seg AS bin, y FROM base
          UNION ALL
          SELECT 'price_bucket' AS feature, pb AS bin, y FROM base
        ),
        cnt AS (
          SELECT feature, bin, SUM(y) AS n_good, SUM(1 - y) AS n_bad
          FROM binned GROUP BY feature, bin
        ),
        tot AS (
          SELECT feature, bin, n_good, n_bad,
                 SUM(n_good) OVER (PARTITION BY feature) AS tg,
                 SUM(n_bad) OVER (PARTITION BY feature) AS tb,
                 COUNT(*) OVER (PARTITION BY feature) AS nb
          FROM cnt
        ),
        woe AS (
          SELECT feature, bin, n_good, n_bad,
                 ln((n_good + 1) * (tb + nb)) - ln((n_bad + 1) * (tg + nb)) AS woe_raw,
                 CAST(n_good + 1 AS DOUBLE) / (tg + nb)
                   - CAST(n_bad + 1 AS DOUBLE) / (tb + nb) AS dp
          FROM tot
        )
        SELECT feature, bin,
               CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
               ROUND(woe_raw, 6) AS woe,
               ROUND(dp * woe_raw, 6) AS iv_term,
               ROUND(SUM(dp * woe_raw) OVER (PARTITION BY feature), 6) AS iv_feature
        FROM woe
    """,
    tags=("L17", "features", "woe"),
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature screening (the
    classic credit-scoring binning diagnostic; Siddiqi 2006, public
    method): binary target y = order priority URGENT/HIGH; features =
    customer market segment (categorical) and o_totalprice in fixed
    {_WOE_PRICE_BIN}-wide buckets capped at {_WOE_PRICE_CAP}. Per
    (feature, bin): WOE = ln(P(bin|good)/P(bin|bad)) with +1
    Laplace smoothing — kept as ln of INTEGER products
    (ln((g+1)*(B+nb)) - ln((b+1)*(G+nb))), the engine-portable float
    discipline — and the bin's IV term (P_g - P_b)*WOE, plus the
    feature-level IV (the sum every feature-selection cut ranks by).

    Scale: one fact-table pass builds the binned union (narrow maps;
    the customer join is broadcast-able at any SF — dims grow slower
    than facts), one map-side-combining groupBy on (feature, bin)
    collapses the corpus to a DOMAIN-BOUNDED rollup (5 segments + 8
    buckets = 13 rows); the per-feature totals/IV windows run on
    those 13 rows partitioned by feature — never on corpus-sized
    input. Output is the full scorecard table."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
        F.col("c_mktsegment").alias("seg"),
        F.least(
            F.floor(F.col("o_totalprice") / _WOE_PRICE_BIN).cast("long"),
            F.lit(_WOE_PRICE_CAP).cast("long"),
        )
        .cast("string")
        .alias("pb"),
    )
    binned = base.select(
        F.lit("mktsegment").alias("feature"), F.col("seg").alias("bin"), "y"
    ).unionAll(base.select(F.lit("price_bucket").alias("feature"), F.col("pb").alias("bin"), "y"))
    cnt = binned.groupBy("feature", "bin").agg(
        F.sum("y").alias("n_good"), F.sum(F.lit(1) - F.col("y")).alias("n_bad")
    )
    # See module docstring: window input is the domain-bounded rollup
    # (<= 13 rows), partitioned by feature — never a corpus window.
    w = Window.partitionBy("feature")
    woe_raw = F.log((F.col("n_good") + 1) * (F.col("tb") + F.col("nb"))) - F.log(
        (F.col("n_bad") + 1) * (F.col("tg") + F.col("nb"))
    )
    dp = (F.col("n_good") + 1).cast("double") / (F.col("tg") + F.col("nb")) - (
        F.col("n_bad") + 1
    ).cast("double") / (F.col("tb") + F.col("nb"))
    return (
        cnt.withColumn("tg", F.sum("n_good").over(w))
        .withColumn("tb", F.sum("n_bad").over(w))
        .withColumn("nb", F.count(F.lit(1)).over(w))
        .withColumn("woe_raw", woe_raw)
        .withColumn("dp", dp)
        .select(
            "feature",
            "bin",
            F.col("n_good").cast("long").alias("n_good"),
            F.col("n_bad").cast("long").alias("n_bad"),
            F.round("woe_raw", 6).alias("woe"),
            F.round(F.col("dp") * F.col("woe_raw"), 6).alias("iv_term"),
            F.round(F.sum(F.col("dp") * F.col("woe_raw")).over(w), 6).alias("iv_feature"),
        )
    )


_QBIN_PS = (0.25, 0.5, 0.75)  # dyadic fractions: p*n is float-EXACT


@register(
    "feature_quantile_binning",
    oracle=f"""
        WITH ranked AS (
          SELECT o_totalprice AS v,
                 CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END AS y,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
          FROM orders
        ),
        n AS (SELECT COUNT(*) AS c FROM orders),
        cuts AS (
          SELECT
            MAX(CASE WHEN rn = CAST(ceil(0.25 * c) AS BIGINT) THEN v END) AS q1,
            MAX(CASE WHEN rn = CAST(ceil(0.5 * c) AS BIGINT) THEN v END) AS q2,
            MAX(CASE WHEN rn = CAST(ceil(0.75 * c) AS BIGINT) THEN v END) AS q3
          FROM ranked CROSS JOIN n
        )
        SELECT CAST(b AS INT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) AS pos_rate_ppm,
               ROUND(MIN(v), 2) AS v_min, ROUND(MAX(v), 2) AS v_max
        FROM (
          SELECT y, v,
                 CASE WHEN v <= c.q1 THEN 0
                      WHEN v <= c.q2 THEN 1
                      WHEN v <= c.q3 THEN 2
                      ELSE 3 END AS b
          FROM ranked CROSS JOIN cuts c
        )
        GROUP BY b
    """,
    tags=("L17", "features", "binning", "quantile"),
)
def feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quartile) feature binning — the other half of
    the binning toolbox beside ``feature_woe_iv``'s fixed-width
    buckets, and the default discretizer for skewed monetary
    features: EXACT type-1 quartile boundaries of ``o_totalprice``
    (the ``ceil(p·n)``-th order statistics under the deterministic
    (value, orderkey) total order — actual data values, so the
    bucketing compares exactly in every engine; the quartile
    fractions are dyadic, making ``p·n`` float-exact too), then each
    order lands in bin 0–3 by boundary comparison and the per-bin
    scorecard reports size, positives (priority URGENT/HIGH) and the
    positive rate as an exact integer ppm (``(10⁶·pos) DIV n`` — no
    float division anywhere).

    Scale: the order statistics come from the two-phase bucketed
    global row-number (``bucketed_rank_cumsum`` — per-bucket windows
    only, never a SinglePartition window; ≤32 bucket-count rows touch
    the driver, plus the 3 cut RANKS computed driver-side from the
    total count, a model-sized scalar). The 1-row boundary frame is
    broadcast back (allowlisted scalar join); the final rollup is a
    4-row map-side-combining aggregate. At 100 TB swap the exact
    order statistics for ``percentile_approx`` boundaries — the plan
    shape (1-row broadcast + CASE + tiny rollup) is unchanged; the
    exact form here is what makes the operator hash-oracle-checkable.
    """
    from hadoop_based_distributed_batch_processing_system_spark.operators.sorts import (
        bucketed_rank_cumsum,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    ranked, n_total, _ = bucketed_rank_cumsum(orders, "v", ["o_orderkey"])
    import math

    cut_ranks = [int(math.ceil(p * n_total)) for p in _QBIN_PS]
    cuts = ranked.filter(F.col("__rn").isin(cut_ranks)).agg(
        *[
            F.max(F.when(F.col("__rn") == r, F.col("v"))).alias(f"q{i + 1}")
            for i, r in enumerate(cut_ranks)
        ]
    )
    binned = ranked.crossJoin(F.broadcast(cuts)).select(
        "y",
        "v",
        F.when(F.col("v") <= F.col("q1"), 0)
        .when(F.col("v") <= F.col("q2"), 1)
        .when(F.col("v") <= F.col("q3"), 2)
        .otherwise(3)
        .alias("b"),
    )
    return binned.groupBy(F.col("b").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.expr("CAST((1000000 * sum(y)) DIV count(1) AS BIGINT)").alias("pos_rate_ppm"),
        F.round(F.min("v"), 2).alias("v_min"),
        F.round(F.max("v"), 2).alias("v_max"),
    )


from hadoop_based_distributed_batch_processing_system_spark.registry import interpolate_docstrings

interpolate_docstrings(globals())
