"""Physical-plan inspection — the 100 TB discipline as a queryable
API instead of ad-hoc string grepping.

``plan_facts(df)`` compiles a DataFrame and extracts the facts every
scale review asks about: how many exchanges (shuffles), which join
strategies, whether a cartesian/broadcast-nested-loop crept in,
whether any Python evaluation node is row-at-a-time, what filters
were pushed into the scans, and what columns the scans actually read.
``tests/test_plans.py`` consumes this for the fleet-wide audit; it is
equally useful interactively:

    python -m hadoop_based_distributed_batch_processing_system_spark.plans.inspect agg_group

Facts come from the text of ``explain()`` output — the same surface a
human reviews — so the module works on any DataFrame with no
py4j internals.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)

_PYTHON_NODES = (
    # UDTF nodes FIRST: a UDTF's eval() is per-row by API contract
    # under EITHER serialization (Arrow vs pickle changes transport
    # only), so neither spelling is a "row-at-a-time UDF" in the
    # banned sense — and the spelling is a measured per-operator
    # choice (r17: Spark 4.1's Arrow UDTF serializer was 8× slower
    # than pickle on udtf_polymorphic_analyze). Counted separately so
    # the BatchEvalPython ban below doesn't substring-match them.
    "BatchEvalPythonUDTF",
    "ArrowEvalPythonUDTF",
    "BatchEvalPython",       # row-at-a-time Python UDF — banned repo-wide
    "ArrowEvalPython",       # vectorized pandas UDF
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanFacts:
    """Structured summary of one physical plan."""

    n_exchanges: int = 0
    join_strategies: dict[str, int] = field(default_factory=dict)
    python_nodes: dict[str, int] = field(default_factory=dict)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_scans: int = 0
    has_take_ordered: bool = False
    n_hash_aggregates: int = 0
    n_window_group_limits: int = 0

    @property
    def has_cartesian(self) -> bool:
        return (
            self.join_strategies.get("CartesianProduct", 0) > 0
            or self.join_strategies.get("BroadcastNestedLoopJoin", 0) > 0
        )

    @property
    def has_row_python(self) -> bool:
        return self.python_nodes.get("BatchEvalPython", 0) > 0

    @property
    def does_partial_aggregation(self) -> bool:
        return self.n_hash_aggregates >= 2


def plan_facts(df: DataFrame) -> PlanFacts:
    """Extract :class:`PlanFacts` from a DataFrame's physical plan.

    Counts come from the ``simple`` plan (each operator printed
    exactly once — ``formatted`` repeats every node in its detail
    section, silently doubling naive counts); pushdown/schema detail
    comes from ``formatted``, which is the only mode that prints
    ``PushedFilters`` / ``ReadSchema``."""
    simple = physical_plan(df, "simple")
    formatted = physical_plan(df, "formatted")

    facts = PlanFacts()
    facts.n_exchanges = simple.count("Exchange")
    for node in _JOIN_NODES:
        n = simple.count(node)
        if n:
            facts.join_strategies[node] = n
    for node in _PYTHON_NODES:
        n = simple.count(node)
        if node == "BatchEvalPython":
            n -= simple.count("BatchEvalPythonUDTF")
        elif node == "ArrowEvalPython":
            n -= simple.count("ArrowEvalPythonUDTF")
        if n:
            facts.python_nodes[node] = n
    facts.n_scans = simple.count("Scan parquet") + simple.count("Scan json") + simple.count(
        "Scan csv"
    ) + simple.count("Scan orc") + simple.count("Scan text")
    facts.has_take_ordered = "TakeOrderedAndProject" in simple
    facts.n_hash_aggregates = simple.count("HashAggregate") + simple.count(
        "ObjectHashAggregate"
    ) + simple.count("SortAggregate")
    facts.n_window_group_limits = simple.count("WindowGroupLimit")
    facts.pushed_filters = [
        m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted) if m.strip()
    ]
    facts.read_schemas = re.findall(r"ReadSchema: (\S+)", formatted)
    return facts


def assert_scalable(df: DataFrame, *, allow_nested_loop: bool = False) -> PlanFacts:
    """Raise ``AssertionError`` if the plan violates the repo's two
    hard scale rules (cartesian/nested-loop joins; row-at-a-time
    Python). Returns the facts for further custom checks."""
    facts = plan_facts(df)
    if facts.has_row_python:
        raise AssertionError("plan contains BatchEvalPython (row-at-a-time Python UDF)")
    if facts.has_cartesian and not allow_nested_loop:
        raise AssertionError(
            f"plan contains a cartesian/nested-loop join: {facts.join_strategies}"
        )
    return facts


def _main(argv: list[str]) -> int:
    """CLI: summarize a registered query's plan at a given sf dir."""
    import json

    from hadoop_based_distributed_batch_processing_system_spark.registry import load_all
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    if not argv:
        print("usage: python -m ...plans.inspect <query_name> [sf_dir]")
        return 2
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    reg = load_all()
    if name not in reg:
        print(f"unknown query {name!r}; {len(reg)} registered")
        return 2
    spark = get_spark(app_name="plan-inspect")
    spark.sparkContext.setLogLevel("ERROR")
    facts = plan_facts(reg[name].fn(spark, sf_dir))
    print(
        json.dumps(
            {
                "query": name,
                "n_exchanges": facts.n_exchanges,
                "join_strategies": facts.join_strategies,
                "python_nodes": facts.python_nodes,
                "has_cartesian": facts.has_cartesian,
                "has_row_python": facts.has_row_python,
                "n_scans": facts.n_scans,
                "n_hash_aggregates": facts.n_hash_aggregates,
                "n_window_group_limits": facts.n_window_group_limits,
                "has_take_ordered": facts.has_take_ordered,
                "pushed_filters": facts.pushed_filters,
                "read_schemas": facts.read_schemas,
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
