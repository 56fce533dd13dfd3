"""MapReduce compatibility layer — the reference system class's
programming model (Mapper / Reducer / optional Combiner over key-value
pairs) executed on Spark.

This is the migration bridge: a user of a Hadoop-style batch system
ports their job by pasting their ``map(record) -> (k, v) pairs`` and
``reduce(key, values) -> outputs`` functions into :func:`run_mapreduce`
— no Spark knowledge required. Execution is still Spark-shaped:

- the map phase runs inside ``mapInPandas`` (Arrow batches in, one
  pass, generator out — no per-row Python call overhead beyond the
  user's own function);
- the combiner (if given) runs INSIDE the same map task over its
  batch's groups — byte-for-byte the MR map-side combine contract,
  shrinking the shuffle before it happens;
- the shuffle is ``repartition(num_reducers, key)`` — hash
  partitioning, the default MR ``Partitioner``;
- the reduce phase is ``applyInPandas`` per key group — the
  ``reduce(key, iterator)`` contract with the whole group present.

Anything expressible as an MR job runs here unchanged; anything more
(joins, windows, SQL) should use the native operators instead — this
layer exists for parity and migration, not as the recommended API.
The declarative engine beats it wherever both apply (no Python in the
hot path, Catalyst optimization) — measured and documented in the
module tests.

Key/value types are strings (the MR lowest common denominator —
``Text``-like); numeric reducers parse as needed, exactly as Hadoop
Streaming jobs did.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_based_distributed_batch_processing_system_spark.registry import register
from hadoop_based_distributed_batch_processing_system_spark.sources.io import load_table

MapFn = Callable[[dict], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], Iterable[tuple[str, str]]]


def run_mapreduce(
    df: DataFrame,
    mapper: MapFn,
    reducer: ReduceFn | None = None,
    combiner: ReduceFn | None = None,
    num_reducers: int = 32,
) -> DataFrame:
    """Execute a classic MapReduce job over a DataFrame.

    ``mapper`` sees each input row as a dict and yields (key, value)
    string pairs. ``reducer`` sees (key, [values]) with the full
    group. ``combiner`` (optional) pre-aggregates map-side output
    per task — same signature as the reducer, same associativity
    requirement as in MR. ``reducer=None`` is a map-only job (the
    grep shape): map output is the job output, no shuffle at all.
    """

    def map_phase(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            vals: list[str] = []
            for rec in pdf.to_dict("records"):
                for k, v in mapper(rec):
                    keys.append(k)
                    vals.append(v)
            out = pd.DataFrame({"k": keys, "v": vals})
            if combiner is not None and len(out):
                ck: list[str] = []
                cv: list[str] = []
                for k, grp in out.groupby("k", sort=False):
                    for ok, ov in combiner(str(k), list(grp["v"])):
                        ck.append(ok)
                        cv.append(ov)
                out = pd.DataFrame({"k": ck, "v": cv})
            yield out

    mapped = df.mapInPandas(map_phase, "k string, v string")
    if reducer is None:
        return mapped

    def reduce_phase(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf["k"].iloc[0])
        ks: list[str] = []
        vs: list[str] = []
        for ok, ov in reducer(key, list(pdf["v"])):
            ks.append(ok)
            vs.append(ov)
        return pd.DataFrame({"k": ks, "v": vs})

    return (
        mapped.repartition(num_reducers, "k")
        .groupBy("k")
        .applyInPandas(reduce_phase, "k string, v string")
    )


@register(
    "mr_wordcount",
    oracle="""
        SELECT term AS k, CAST(CAST(COUNT(*) AS BIGINT) AS VARCHAR) AS v
        FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ) t
        GROUP BY term
        HAVING COUNT(*) >= 100
    """,
    tags=("X1", "X2", "X3", "mr-compat"),
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical MapReduce program, run through the compat layer
    verbatim: map emits (word, "1") per token, combiner and reducer
    both sum — the exact WordCount from the Hadoop tutorial, with the
    combiner doing real map-side work. Output filtered to frequent
    terms, then hash-checked against the declarative oracle — the
    compat layer must agree with SQL to the byte."""

    def wc_map(rec: dict):
        for tok in str(rec["text"]).lower().split(" "):
            yield tok, "1"

    def wc_sum(key: str, values: list[str]):
        yield key, str(sum(int(x) for x in values))

    docs = load_table(spark, sf_dir, "documents").select("text")
    counted = run_mapreduce(docs, wc_map, reducer=wc_sum, combiner=wc_sum)
    return counted.filter(F.col("v").cast("long") >= 100)


@register(
    "mr_grep_map_only",
    oracle="""
        SELECT CAST(doc_id AS VARCHAR) AS k, text AS v
        FROM documents
        WHERE regexp_matches(text, 'scan \\w+ fast')
    """,
    tags=("X1", "mr-compat"),
)
def mr_grep_map_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep as a MAP-ONLY job (reducer=None) — the other
    canonical MR demo (Dean & Ghemawat §2.1) and the shape of every
    scan-filter-extract pipeline: no shuffle exists in the plan at
    all, output is the map output. The regex runs in user Python here
    (compat semantics); the native `filter_regex` operator is the
    100 TB path (JVM rlike, pushdown-adjacent)."""
    import re

    pat = re.compile(r"scan \w+ fast")

    def grep_map(rec: dict):
        if pat.search(str(rec["text"])):
            yield str(rec["doc_id"]), str(rec["text"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return run_mapreduce(docs, grep_map, reducer=None)
