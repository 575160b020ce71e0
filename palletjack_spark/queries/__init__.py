"""Declared query inventory (SURVEY.md §2.2) with DuckDB oracles.

Importing this package registers every query module.  ``REGISTRY`` maps a
stable query id to a :class:`QuerySpec` whose ``fn(spark, sf_dir)`` returns
a DataFrame and whose ``oracle`` is the equivalent DuckDB SQL (or ``None``
for genuinely non-SQL-expressible operators, which get a rows-only check).
"""

from palletjack_spark.queries.registry import REGISTRY, QuerySpec, query

# import for registration side effects
from palletjack_spark.queries import (  # noqa: F401,E402
    scans,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    scalar_functions,
    udfs,
    llm_ops,
    streaming_queries,
    analytics,
    retrieval,
)

__all__ = ["REGISTRY", "QuerySpec", "query"]
