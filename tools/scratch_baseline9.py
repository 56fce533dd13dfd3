"""One-off plain-PySpark baselines for the three late-round-9 ops (sf0.1,
warm, best-of-3, same method as BASELINE.md). Independent idiomatic
DataFrame code — no engine layer. Run one name per process:
    python scratch_baseline9.py allpairs|hits|woe
"""
import sys, time, json
from pyspark.sql import SparkSession, functions as F, Window

SF = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[*]")
    .appName("plain-baseline9")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def plain_allpairs():
    # Idiomatic prefix-filter join: string 3-word shingles built the
    # naive way (slice over an ALIASED split column — the re-inlined
    # HOF form), string tokens end-to-end, cache() for reuse.
    t = 0.5
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split("text", " ")
    base = docs.filter(F.size(toks) >= 3).select("doc_id", toks.alias("ts"))
    sh = base.select(
        "doc_id",
        F.array_distinct(
            F.expr("transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))")
        ).alias("sh"),
    ).cache()
    ex = sh.select("doc_id", F.explode("sh").alias("token"))
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    ordered = (
        ex.join(freq, "token")
        .groupBy("doc_id")
        .agg(F.expr("transform(sort_array(collect_list(struct(freq, token))), s -> s.token)").alias("toks"))
        .withColumn("sz", F.size("toks"))
        .withColumn("plen", F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1))
    )
    pref = ordered.select("doc_id", "sz", F.explode(F.expr("slice(toks, 1, CAST(plen AS INT))")).alias("token"))
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least("a.sz", "b.sz") >= F.lit(t) * F.greatest("a.sz", "b.sz")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= t)
    )


def plain_hits():
    # Identical 6-round loop, no caching, no join hints (AQE free to
    # broadcast the edge list), per-round L1 normalization the way the
    # textbook statement writes it (crossJoin of the 1-row total).
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # NOTE: the textbook per-round L1-normalized form (score/total via
    # crossJoin of the 1-row sum) references each round frame TWICE,
    # so the lazy logical plan doubles per half-round (2^12) and the
    # JVM dies with OutOfMemoryError during analysis — the kcore DNF
    # mode (measured 2026-08-15). This friendlier plain variant skips
    # per-round normalization like the engine but stays uncached and
    # unhinted.
    hub = pairs.select(F.col("c").alias("node")).distinct().withColumn("score", F.lit(1.0))
    for _ in range(6):
        auth = pairs.join(hub, pairs.c == hub.node).groupBy(F.col("s").alias("node")).agg(F.sum("score").alias("score"))
        hub = pairs.join(auth, pairs.s == auth.node).groupBy(F.col("c").alias("node")).agg(F.sum("score").alias("score"))

    def side(fr, kind):
        tot = fr.agg(F.sum("score").alias("t"))
        return (
            fr.crossJoin(tot)
            .select(F.lit(kind).alias("kind"), F.col("node").cast("long").alias("node"),
                    F.round(F.lit(1000) * F.col("score") / F.col("t"), 6).alias("score_permille"))
            .orderBy(F.desc("score_permille"), F.asc("node"))
            .limit(25)
        )

    return side(auth, "authority").unionAll(side(hub, "hub"))


def plain_woe():
    # One scan PER feature (two fact passes), totals via aggregate +
    # rejoin instead of windows, plain sort-merge customer join.
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("y"),
        F.col("c_mktsegment").alias("seg"),
        F.least(F.floor(F.col("o_totalprice") / 62500).cast("long"), F.lit(7).cast("long")).cast("string").alias("pb"),
    )
    outs = []
    for feat, col in (("mktsegment", "seg"), ("price_bucket", "pb")):
        cnt = base.groupBy(F.col(col).alias("bin")).agg(
            F.sum("y").alias("n_good"), F.sum(F.lit(1) - F.col("y")).alias("n_bad")
        ).withColumn("feature", F.lit(feat))
        tot = cnt.agg(F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb"), F.count(F.lit(1)).alias("nb"))
        woe_raw = F.log((F.col("n_good") + 1) * (F.col("tb") + F.col("nb"))) - F.log((F.col("n_bad") + 1) * (F.col("tg") + F.col("nb")))
        dp = (F.col("n_good") + 1).cast("double") / (F.col("tg") + F.col("nb")) - (F.col("n_bad") + 1).cast("double") / (F.col("tb") + F.col("nb"))
        enriched = cnt.crossJoin(tot).withColumn("woe_raw", woe_raw).withColumn("dp", dp)
        outs.append(
            enriched.select(
                "feature", "bin",
                F.col("n_good").cast("long").alias("n_good"), F.col("n_bad").cast("long").alias("n_bad"),
                F.round("woe_raw", 6).alias("woe"),
                F.round(F.col("dp") * F.col("woe_raw"), 6).alias("iv_term"),
                F.round(F.sum(F.col("dp") * F.col("woe_raw")).over(Window.partitionBy("feature")), 6).alias("iv_feature"),
            )
        )
    return outs[0].unionAll(outs[1])


FNS = {"allpairs": plain_allpairs, "hits": plain_hits, "woe": plain_woe}


def plain_pmi():
    # Two corpus scans (separate unigram pass), product-form ln, no
    # rounded-before-limit discipline (plain ORDER BY float).
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    bi = toks.select(
        F.explode(F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).alias("b")
    ).select("b.w1", "b.w2")
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    uni = toks.select(F.explode("t").alias("w")).groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = big.agg(F.sum("n").alias("nn"))
    return (
        big.filter(F.col("n") >= 25)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(tot)
        .select("w1", "w2", "n", F.round(F.log(F.col("nn") * F.col("n") / (F.col("c1") * F.col("c2"))), 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


def plain_qbin():
    # The single-partition global ROW_NUMBER trap: one task ranks the
    # whole table, boundaries via filtered collect.
    import math
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("y"),
    )
    w = Window.orderBy("v", "o_orderkey")
    ranked = orders.withColumn("rn", F.row_number().over(w)).cache()
    n = ranked.count()
    ranks = [int(math.ceil(p * n)) for p in (0.25, 0.5, 0.75)]
    qs = [r["v"] for r in ranked.filter(F.col("rn").isin(ranks)).orderBy("rn").collect()]
    binned = ranked.select(
        "y", "v",
        F.when(F.col("v") <= qs[0], 0).when(F.col("v") <= qs[1], 1).when(F.col("v") <= qs[2], 2).otherwise(3).alias("b"),
    )
    out = binned.groupBy(F.col("b").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"),
        F.expr("CAST((1000000 * sum(y)) DIV count(1) AS BIGINT)").alias("ppm"),
        F.round(F.min("v"), 2).alias("v_min"), F.round(F.max("v"), 2).alias("v_max"),
    )
    out.collect()
    ranked.unpersist()
    return out


def plain_sssp():
    # Identical Bellman-Ford loop, uncached dist frames (each round
    # references the previous frame twice -> 2^rounds plan growth).
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy((F.col("o_custkey") * 2).alias("cnode"), (F.col("l_suppkey") * 2 + 1).alias("snode"))
        .agg((F.lit(1) + F.min(F.datediff("l_shipdate", "o_orderdate"))).alias("w"))
    )
    edges = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"), "w").unionAll(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"), "w")
    )
    dists = (
        supplier.filter(F.col("s_nationkey") == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node")).distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for _ in range(4):
        relaxed = edges.join(dists, edges.src == dists.node).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dists = dists.unionAll(relaxed).groupBy("node").agg(F.min("dist").alias("dist"))
    return dists.select(
        "node", F.col("dist").cast("long").alias("dist"),
        F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("node_type"),
    )


def plain_smoments():
    # Stateful twin keeping ALL raw values per key as state, exact
    # float mean/var recomputed from the full buffer every batch.
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def upd(key, pdfs, state: GroupState):
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        for pdf in pdfs:
            buf.extend(float(v) for v in pdf["value"])
        state.update((buf,))
        import numpy as np
        a = np.array(buf)
        yield pd.DataFrame({"user_id": [key[0]], "n_obs": [len(buf)],
                            "mean_v": [round(float(a.mean()), 6)], "var_v": [round(float(a.var()), 6)]})

    import os, tempfile
    d = tempfile.mkdtemp(prefix="pb_events_")
    os.symlink(f"{SF}/events.parquet", os.path.join(d, "events.parquet"))
    ev = (
        spark.readStream.schema(spark.read.parquet(f"{SF}/events.parquet").schema)
        .parquet(d).select("user_id", "value")
    )
    res = ev.groupBy("user_id").applyInPandasWithState(
        upd, outputStructType="user_id long, n_obs long, mean_v double, var_v double",
        stateStructType="buf array<double>", outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    import uuid
    qn = "pb_" + uuid.uuid4().hex[:8]
    q = res.writeStream.format("memory").queryName(qn).outputMode("update").trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(qn)


FNS.update({"pmi": plain_pmi, "qbin": plain_qbin, "sssp": plain_sssp, "smoments": plain_smoments})


def plain_wres():
    # Same A-ES scheme, plain spelling: float pow key (u^(1/w)),
    # unrounded ordering, no WindowGroupLimit discipline concerns.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = F.expr("CAST(conv(substr(md5(concat('wres|', CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)")
    keyed = docs.select(
        "source", "doc_id",
        F.size(F.split("text", " ")).alias("w"),
        F.pow((h + 1) / F.lit(281474976710656.0), 1.0 / F.size(F.split("text", " "))).alias("k"),
    )
    win = Window.partitionBy("source").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", F.col("w").cast("long").alias("n_tokens"), F.round(F.log("k") , 6).alias("skey"))
    )


def plain_tfidf_sparse():
    # Same df cap (uncapped DNFs: stopword postings make the token
    # self-join quadratic in corpus size), but the weight table is a
    # plain uncached lineage — recomputed in full by the norm pass AND
    # both sides of the dot join — and idf is the float-division form.
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tf = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.count()
    wt = tf.join(dfc.filter((F.col("df") <= 100) & (F.col("df") < nd)), "w").select(
        "doc_id", "w", (F.col("tf") * F.log(F.lit(float(nd)) / F.col("df"))).alias("wgt")
    )
    nrm = wt.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nn"))
    a = wt.select(F.col("doc_id").alias("id_a"), "w", F.col("wgt").alias("wa"))
    b = wt.select(F.col("doc_id").alias("id_b"), "w", F.col("wgt").alias("wb"))
    dots = (
        a.join(b, (a.w == b.w) & (a.id_a < b.id_b))
        .groupBy("id_a", "id_b").agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nn").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nn").alias("nb"))
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .select("id_a", "id_b", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "id_a", "id_b").limit(20)
    )


FNS.update({"wres": plain_wres, "tfidfsp": plain_tfidf_sparse})




def plain_seqpat():
    # Plain idiom: per-user string via a window collect_list with an
    # unbounded frame (every row carries the growing prefix) +
    # per-user dedup — vs the engine's single groupBy secondary sort.
    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = (
        ev.select("user_id", F.substring("event_type", 1, 1).alias("ini"), "ts", "event_id")
        .withColumn("s", F.array_join(F.collect_list("ini").over(w), ""))
        .select("user_id", "s")
        .dropDuplicates(["user_id"])
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.size(F.expr("regexp_extract_all(s, 'v+cp', 0)")).cast("long").alias("n_funnels"),
        F.length(F.regexp_extract("s", "^(.*?v+cp)", 1)).cast("long").alias("first_funnel_end"),
    )


FNS.update({"seqpat": plain_seqpat})


def plain_seqpat_stream():
    # Buffer-everything trap: the FULL initial string per key as state,
    # regex re-run on the whole buffer every batch.
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import re as _re

    def upd(key, pdfs, state: GroupState):
        (buf,) = state.get if state.exists else ("",)
        parts = [p for p in pdfs]
        batch = pd.concat(parts) if len(parts) > 1 else parts[0]
        batch = batch.sort_values(["ts", "event_id"])
        buf = buf + "".join(batch["ini"])
        state.update((buf,))
        m = _re.search(r"^(.*?v+cp)", buf)
        yield pd.DataFrame({"user_id": [key[0]], "seq_len": [len(buf)],
                            "n_funnels": [len(_re.findall(r"v+cp", buf))],
                            "first_funnel_end": [len(m.group(1)) if m else 0]})

    import os, tempfile
    d = tempfile.mkdtemp(prefix="pb_ev2_")
    os.symlink(f"{SF}/events.parquet", os.path.join(d, "events.parquet"))
    ev = (
        spark.readStream.schema(spark.read.parquet(f"{SF}/events.parquet").schema)
        .parquet(d).select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("ini"))
    )
    res = ev.groupBy("user_id").applyInPandasWithState(
        upd, outputStructType="user_id long, seq_len long, n_funnels long, first_funnel_end long",
        stateStructType="buf string", outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    import uuid
    qn = "pb_" + uuid.uuid4().hex[:8]
    q = res.writeStream.format("memory").queryName(qn).outputMode("update").trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(qn)


FNS.update({"seqpatstream": plain_seqpat_stream})



def plain_benford():
    # Plain spelling: stringify the DOUBLE directly (the engine uses the
    # integer part's string — double stringification is the portability
    # trap, not a perf difference) and recompute expectation per row.
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(F.col("o_totalprice") >= 1)
    obs = (
        orders.select(F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("bigint").alias("digit"))
        .groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("nt"))
    p = (F.log(F.col("digit") + 1) - F.log("digit")) / F.log(F.lit(10))
    exp_n = F.col("nt") * p
    term = F.pow(F.col("n") - exp_n, 2) / exp_n
    w = Window.partitionBy()
    return obs.crossJoin(tot).select(
        F.col("digit").cast("int").alias("digit"), F.col("n").cast("long").alias("n_obs"),
        F.round(exp_n, 6).alias("n_expected"), F.round(term, 6).alias("chi2_term"),
        F.round(F.sum(term).over(w), 6).alias("chi2_total"),
    )


FNS.update({"benford": plain_benford})

name = sys.argv[1]
fn = FNS[name]
fn().collect()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    fn().collect()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({name: round(best, 3)}))
spark.stop()
