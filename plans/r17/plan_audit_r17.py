import os, sys, io, time, json, contextlib
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"
from palletjack_spark import get_spark
from palletjack_spark.queries import REGISTRY
import bench
spark = get_spark(app_name="plan_audit", cpus="32")
sc = spark.sparkContext
REGISTRY["q13_pushdown_prune"].fn(spark, SF).collect()
spark.range(32).mapInPandas(lambda it: it, "id long").count()
out = {}
for name in bench.HEADLINE:
    rec = {}
    try:
        b = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, SF)
        rec["build_jobs"] = sc._jsc.sc().dagScheduler().nextJobId() - b
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        b2 = sc._jsc.sc().dagScheduler().nextJobId()
        n = df.count()
        rec["count_jobs"] = sc._jsc.sc().dagScheduler().nextJobId() - b2
        rec["secs"] = round(time.perf_counter() - t0, 3)
        rec["rows"] = n
        for pat in ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                    "SortAggregate", "SortMergeJoin", "BroadcastNestedLoopJoin",
                    "MapInPandas", "ArrowEvalPythonUDTF", "PythonMapInArrow"]:
            c = p.count(pat)
            if c: rec[pat] = c
        rec["Exchange"] = p.count("Exchange")
        rec["pushed"] = p.count("PushedFilters: [")  # scans with any pushed-filter line
        open(f"/tmp/plans_audit/{name}.txt", "w").write(p)
    except Exception as ex:
        rec["err"] = repr(ex)[:200]
    out[name] = rec
    print(name, json.dumps(rec), flush=True)
    spark.catalog.clearCache()
json.dump(out, open("/tmp/plan_audit.json", "w"), indent=1)
spark.stop()
