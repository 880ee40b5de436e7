"""Query registry: every operator from SURVEY.md §2 as a named query.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle string — the driver contract in
``__spark_entry__.py``. Modules:

- ``relational``: joins, aggregations, window functions, sorts, set
  ops, scalar functions (SURVEY.md §2.4).
- ``events``: time windows, sessionization, as-of join, JSON, dedup
  on the event stream (SURVEY.md §2.3 batch-equivalents).
- ``llm``: text analysis, dedup families, similarity search, and
  multimodal metadata (north-star extensions).
- ``engine``: the ORC sink and the Structured Streaming runtime
  themselves, value-checked against batch oracles.
"""

from flink_orc_sink_spark.queries import engine, events, llm, relational


def all_queries():
    merged = {}
    for mod in (relational, events, llm, engine):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles():
    merged = {}
    for mod in (relational, events, llm, engine):
        merged.update(mod.ORACLES)
    return merged
