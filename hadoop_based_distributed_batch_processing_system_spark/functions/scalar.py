"""Scalar function families (SURVEY.md §2.8, F1-F6).

One composite query per family so the whole built-in function
surface stays oracle-checkable without one registry entry per
function. Cross-engine spelling and convention notes are inline —
these are the validated Spark↔DuckDB mappings from FIXTURES.md:
``split``↔``string_split``, ``get_json_object``↔``json_extract``,
``dayofweek`` off-by-one, ``regexp_replace`` needs the ``'g'`` flag
in DuckDB, integer-typed ``ceil``/``floor`` casts.

Scale notes: everything here is a Catalyst expression inside
whole-stage codegen — zero Python, zero shuffle (except F6's final
small group-by).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table


@register(
    "fn_string",
    oracle=r"""
        SELECT p_partkey,
               lower(p_name)                        AS name_lower,
               upper(p_brand)                       AS brand_upper,
               trim(concat('  ', p_name, '  '))     AS name_trim,
               substring(p_name, 1, 5)              AS name_pre5,
               concat(p_brand, ':', p_name)         AS brand_name,
               length(p_name)                       AS name_len,
               regexp_extract(p_name, '^(\w+)', 1)  AS first_word,
               regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
               array_to_string(string_split(p_name, ' '), '|') AS name_tokens
        FROM part
    """,
    tags=("F1",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — string family: case, trim, substring, concat, length,
    regex extract/replace, split. DuckDB gotcha: its regexp_replace
    is first-match-only without the 'g' flag; Spark is global."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pre5"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_name")).alias("brand_name"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.array_join(F.split("p_name", " "), "|").alias("name_tokens"),
    )


@register(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                                       AS yr,
               month(o_orderdate)                                      AS mo,
               day(o_orderdate)                                        AS dom,
               dayofweek(o_orderdate) + 1                              AS dow,
               date_trunc('month', o_orderdate)                        AS month_start,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)   AS days_since_epoch0,
               CAST(epoch(o_orderdate) AS BIGINT)                      AS unix_sec,
               o_orderdate + INTERVAL 7 DAY                            AS plus_week
        FROM orders
    """,
    tags=("F2",),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — date/time family. Convention trap: Spark dayofweek is
    1=Sunday..7=Saturday, DuckDB is 0=Sunday..6=Saturday — the oracle
    adds 1. Spark date_add returns DATE; cast back to timestamp to
    match DuckDB's timestamp + interval."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp")).alias("days_since_epoch0"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.date_add("o_orderdate", 7).cast("timestamp").alias("plus_week"),
    )


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 2)                    AS price_2dp,
               abs(l_quantity - 25)                         AS qty_dev,
               CAST(ceil(l_discount * 100) AS BIGINT)       AS disc_pct_ceil,
               CAST(floor(l_tax * 100) AS BIGINT)           AS tax_pct_floor,
               pow(1 + l_tax, 2)                            AS tax_sq,
               ln(l_extendedprice)                          AS log_price,
               exp(l_discount)                              AS exp_disc,
               greatest(l_quantity, l_discount * 100)       AS hi,
               least(l_quantity, l_discount * 100)          AS lo,
               CASE WHEN l_quantity > 40 THEN 'bulk'
                    WHEN l_quantity > 10 THEN 'mid'
                    ELSE 'small' END                        AS qty_band
        FROM lineitem
    """,
    tags=("F3",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — math family + CASE WHEN. Spark ceil/floor return LONG
    natively; DuckDB returns DOUBLE — the oracle casts to BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_2dp"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.pow(F.lit(1) + F.col("l_tax"), 2).alias("tax_sq"),
        F.log(F.col("l_extendedprice")).alias("log_price"),
        F.exp("l_discount").alias("exp_disc"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("hi"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("lo"),
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
    )


@register(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding)                                   AS n_dims,
               embedding[1]                                     AS first_val,
               list_sum(embedding[1:3]::DOUBLE[])               AS sum3,
               list_sort(embedding[1:4])[1]                     AS sorted4_1,
               list_sort(embedding[1:4])[2]                     AS sorted4_2,
               list_sort(embedding[1:4])[3]                     AS sorted4_3,
               list_sort(embedding[1:4])[4]                     AS sorted4_4,
               list_max(embedding)                              AS max_val,
               list_contains(embedding, 0.0::FLOAT)             AS has_zero
        FROM embeddings
    """,
    tags=("F4",),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — array family: size, element_at, slice, fold (aggregate),
    sort_array, array_max, array_contains. The fold casts each
    element to double so both engines accumulate left-to-right in
    float64 — bit-identical results."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).alias("first_val"),
        F.aggregate(
            F.slice("embedding", 1, 3), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("sum3"),
        # Driver-facing: the sorted slice is unnested into 4 scalar float
        # columns (float arrays don't stringify identically cross-engine,
        # and the driver's canonicalizer can't hash list cells).
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 1).alias("sorted4_1"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 2).alias("sorted4_2"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 3).alias("sorted4_3"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 4).alias("sorted4_4"),
        F.array_max("embedding").alias("max_val"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "fn_map",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
               'k'                                         AS prop_keys,
               true                                        AS has_k
        FROM events
    """,
    tags=("F5",),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — map family. The corpus has no native map column, so the
    map is built from the JSON payload (create_map), then probed with
    map_keys / element_at / array_contains. Only scalar results are
    emitted — cross-engine map-value hashing is not comparable."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("int"))
    return ev.select(
        "event_id",
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_type,
               AVG(CAST(json_extract(props, '$.k') AS INTEGER))  AS avg_k,
               MIN(CAST(json_extract(props, '$.k') AS INTEGER))  AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS INTEGER))  AS max_k,
               COUNT(*)                                          AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("F6",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — lazy JSON field extraction + aggregate (headline bench
    query: events_json_extract). get_json_object evaluates without
    materializing a parsed struct; at scale prefer one from_json
    with an explicit schema when extracting many fields."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.avg(k).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "fn_higher_order",
    oracle="""
        SELECT vec_id,
               ROUND(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'), 6) AS sum_sq,
               CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER) AS n_pos,
               list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> CASE WHEN x > 0.5 THEN 1 ELSE 0 END), 'max') = 1 AS any_big,
               list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> CASE WHEN abs(x) <= 1.0 THEN 1 ELSE 0 END), 'min') = 1 AS all_unit
        FROM embeddings
    """,
    tags=("F4", "hof"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4' — higher-order-function family over array columns:
    transform (map), filter, exists, forall, aggregate (fold) — the
    lambda surface that keeps per-element logic inside whole-stage
    codegen instead of a Python UDF. The left-to-right double fold
    makes sum_sq bitwise-reproducible against DuckDB's list_aggregate
    'sum' on the same cast doubles. exists/forall are spelled as
    max/min over indicator transforms in the oracle (DuckDB's
    list_bool_or differs in NULL handling)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.select(
        "vec_id",
        F.round(
            F.expr("aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), (acc, e) -> acc + e)"),
            6,
        ).alias("sum_sq"),
        F.size(F.filter("v", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.exists("v", lambda x: x > 0.5).alias("any_big"),
        F.forall("v", lambda x: F.abs(x) <= 1.0).alias("all_unit"),
    )


@register(
    "fn_conversions",
    oracle="""
        SELECT o_orderkey,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor_long,
               CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
               TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
               CAST(o_orderdate AS DATE) AS order_date
        FROM orders
    """,
    tags=("F3", "cast"),
)
def fn_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast / try_cast family — type-conversion semantics under ANSI
    mode (Spark 4's default): double→bigint TRUNCATES toward zero in
    Spark but ROUNDS in DuckDB — the oracle floors explicitly (one of
    the cross-engine cast traps this differential suite exists to
    catch); long↔string roundtrips exactly; `try_cast` of a
    non-numeric string yields NULL instead of failing the job (the
    ingestion-hardening idiom for dirty data at scale — one malformed
    row must not kill a 100 TB job); timestamp→date truncates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_floor_long"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_digit"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "fn_string_distance",
    oracle="""
        SELECT p_partkey, p_name,
               levenshtein(p_name, 'red widget') AS dist_widget,
               array_to_string(list_transform(string_split(p_name, ' '),
                 w -> upper(w[1]) || lower(w[2:])), ' ') AS title_name,
               translate(p_name, 'aeiou', 'AEIOU') AS vowels_up
        FROM part
        WHERE levenshtein(p_name, 'red widget') <= 5
    """,
    tags=("F1", "distance"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance + case/translate family: Levenshtein edit
    distance (fuzzy matching — the poor man's near-dup for SHORT
    strings; MinHash takes over at document length), initcap,
    translate. The distance predicate is O(len²) per comparison
    against a constant — fine in a scan; never use it as a join
    condition at scale (that's an all-pairs product — LSH instead)."""
    p = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return (
        p.filter(dist <= 5)
        .select(
            "p_partkey",
            "p_name",
            dist.alias("dist_widget"),
            F.initcap("p_name").alias("title_name"),
            F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        )
    )


@register(
    "fn_json_struct",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
               CAST(json_extract(props, '$.missing') AS INTEGER) AS absent_field
        FROM events
    """,
    tags=("F6", "json"),
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6' — schema-full JSON parsing: `from_json` with a declared
    StructType turns the string column into a typed struct ONCE, and
    every field access afterwards is a cheap struct getter — versus
    `get_json_object`, which re-parses the string per extraction.
    With many extracted fields, from_json is the scan-speed winner.
    Missing fields surface as typed NULLs (not errors) — the
    tolerant-reader contract for evolving event payloads."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", "k INT, missing INT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_typed"),
        F.col("p.missing").alias("absent_field"),
    )


@register(
    "fn_generators",
    oracle="""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0 THEN [] ELSE string_split(text, ' ')[1:2] END AS toks
          FROM documents
        )
        SELECT doc_id, tok, CAST(pos AS INTEGER) AS pos FROM (
          SELECT doc_id,
                 unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS tok,
                 unnest(CASE WHEN len(toks) = 0 THEN [NULL]
                        ELSE range(0, len(toks)) END) AS pos
          FROM src
        )
    """,
    tags=("F7", "generator"),
)
def fn_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — null-preserving generators: ``posexplode_outer`` keeps a
    row (with NULL token/pos) when the array is empty, where plain
    explode silently DROPS the parent row — the generator-family
    analogue of inner-vs-outer join, and a classic silent-data-loss
    bug in token pipelines (empty docs vanish from per-doc stats).
    Every 10th doc's token array is emptied to force the case. The
    DuckDB oracle emulates outer semantics by substituting [NULL]
    for empty lists (its unnest drops empties like explode does)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.when(F.col("doc_id") % 10 == 0, F.array().cast("array<string>")).otherwise(
        F.slice(F.split("text", " "), 1, 2)
    )
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    ).select("doc_id", "tok", "pos")


@register(
    "fn_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
               CAST(json_extract(props, '$.k') AS DOUBLE)  AS k_as_double,
               'OBJECT<k: BIGINT>'                         AS v_schema
        FROM events
    """,
    tags=("F8", "variant"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — Spark 4 VARIANT, the modern semi-structured path: parse
    the JSON payload ONCE into a binary variant (typed, shreddable at
    the storage layer), then extract typed fields with
    ``variant_get`` and introspect with ``schema_of_variant``. Versus
    per-field ``get_json_object`` (re-parses the string per call,
    F6), one parse serves every extraction — the difference between
    O(fields) and O(1) parses per row on wide payloads. The oracle
    types each extraction via DuckDB json_extract casts; the schema
    string is constant because every props payload has the same
    single-key shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_typed"),
        F.expr("variant_get(parse_json(props), '$.k', 'double')").alias("k_as_double"),
        F.expr("schema_of_variant(parse_json(props))").alias("v_schema"),
    )


@register(
    "fn_xml",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_from_xml,
               event_type AS type_from_xml
        FROM events
    """,
    tags=("F9", "xml"),
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — XML ingestion surface (``from_xml``, Spark 4): the events
    payload is re-serialized as an XML document JVM-side, then parsed
    back with a declared schema — a full XML round-trip proving the
    parse path (the corpus ships no native XML, so the operator
    manufactures real XML from real data; the oracle recomputes the
    same fields from the original JSON). Same discipline as scan_csv/
    scan_json: explicit schema, never inference, and parse-once into
    a typed struct."""
    ev = load_table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><k>"),
        F.coalesce(F.get_json_object("props", "$.k"), F.lit("")),
        F.lit("</k><t>"),
        F.col("event_type"),
        F.lit("</t></e>"),
    )
    parsed = ev.select("event_id", F.from_xml(xml, "k INT, t STRING").alias("s"))
    return parsed.select(
        "event_id",
        F.col("s.k").alias("k_from_xml"),
        F.col("s.t").alias("type_from_xml"),
    )
