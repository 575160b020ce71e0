"""Child process for tests/test_jvm_routing.py: launched with
PYSPARK_SUBMIT_ARGS carrying --driver-class-path + spark.sql.extensions,
because both bind at JVM launch (a fixture session can't adopt them).

Prints one JSON line of observations for the parent to assert on."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def _lr_input_files(df):
    """Leaf LogicalRelation file count + paths from the OPTIMIZED plan."""
    plan = df._jdf.queryExecution().optimizedPlan()
    stack, found = [plan], []

    def children(node):
        ch = node.children()
        return [ch.apply(i) for i in range(ch.size())]

    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "LogicalRelation":
            found.extend(list(node.relation().location().inputFiles()))
        stack.extend(children(node))
    return sorted(found)


def main(tmp: str) -> None:
    data = os.path.join(tmp, "data")
    os.makedirs(data)
    for i in range(4):
        pq.write_table(
            pa.table({"v": pa.array(range(i * 100, i * 100 + 100), type=pa.int64()),
                      "tag": pa.array([f"t{i}"] * 100)}),
            os.path.join(data, f"part-{i}.parquet"),
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jvm-routing-child")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from palletjack_spark.index.jvm_routing import (
        jvm_routing_available,
        register_index_jvm,
    )
    from palletjack_spark.index.smart import smart_read

    out = {"available": jvm_routing_available(spark)}

    sql = f"SELECT v, tag FROM parquet.`{data}` WHERE v >= 250"
    # BEFORE registration: plain Spark, all 4 files scanned
    out["files_before"] = len(_lr_input_files(spark.sql(sql)))

    out["n_registered"] = register_index_jvm(spark, data)

    pruned = spark.sql(sql)
    files_after = _lr_input_files(pruned)
    out["files_after"] = len(files_after)
    out["kept_files"] = [os.path.basename(f) for f in files_after]
    rows = sorted((r["v"], r["tag"]) for r in pruned.collect())
    out["n_rows"] = len(rows)
    out["row_hash"] = hash(tuple(rows)) & 0xFFFFFFFF

    # hash-equal to smart_read on the same inputs
    sm = sorted(
        (r["v"], r["tag"])
        for r in smart_read(spark, data, predicate=[("v", ">=", 250)]).collect()
    )
    out["smart_read_equal"] = sm == rows

    # a disjunction the rule can't prove must fall through unpruned
    disj = spark.sql(f"SELECT v FROM parquet.`{data}` WHERE v >= 250 OR tag = 't0'")
    out["files_disjunction"] = len(_lr_input_files(disj))
    out["n_rows_disjunction"] = disj.count()

    # equality predicate prunes to one file
    eq = spark.sql(f"SELECT v FROM parquet.`{data}` WHERE v = 123")
    out["files_eq"] = len(_lr_input_files(eq))
    out["n_rows_eq"] = eq.count()

    print("RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
