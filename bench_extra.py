"""Per-query isolation bench + plan capture (guide §1.4/§1.5).

NOT the driver-timed harness (that is the frozen bench.py).  This tool:

* times individual declared queries (same ``.count()`` action as bench.py,
  or ``--noop`` for a full-column noop sink per guide §1.4),
* labels jobs via setJobDescription so the UI/event logs are readable,
* optionally writes ``.explain("formatted")`` to plans/r06/<q>_<tag>.txt.

Usage:
    python bench_extra.py [--reps N] [--noop] [--explain TAG] q1 [q2 ...]
    python bench_extra.py --explain before graph_build rule_mining

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="noop sink instead of count()")
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="write plans/r06/<q>_<TAG>.txt")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from climatemind_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="cmkg-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    def build(name):
        if name == "graph_build":
            import json as _json
            from importlib import resources
            from climatemind_ontology_processing_spark.operators.graph_pipeline import build_graph
            from climatemind_ontology_processing_spark.sources.dictionary import concepts_df
            golden = _json.loads(
                (resources.files("climatemind_ontology_processing_spark.data")
                 / "golden_graph.json").read_text())
            triples_fixture = spark.createDataFrame(
                [(e["src"], e["type"], e["dst"]) for e in golden["edges"]],
                "subj string, pred string, obj string")

            class _GB:
                def count(self):
                    bundle = build_graph(triples_fixture, concepts_df(spark))
                    bundle.subgraph_nodes.count()
                    return bundle.nodes.count()
            return _GB()
        if name == "triples_pipeline":
            from climatemind_ontology_processing_spark.plans.pipeline import triples_from_pages
            from climatemind_ontology_processing_spark.sources.pages import pages_df
            import re
            m = re.search(r"sf([0-9.]+)", sf_dir)
            sf = float(m.group(1)) if m else 0.1
            n_pages = max(int(500_000 * sf), 1000)
            return triples_from_pages(
                pages_df(spark, n_pages, seed=42, partitions=cpus * 2))
        return qs[name](spark, sf_dir)

    # warm-up (same as bench.py)
    from climatemind_ontology_processing_spark.plans.pipeline import triples_from_pages
    from climatemind_ontology_processing_spark.sources.pages import pages_df
    triples_from_pages(pages_df(spark, 1000, seed=1, partitions=cpus)).count()

    out: dict[str, list[float]] = {}
    for name in args.names:
        if args.explain is not None and name != "graph_build":
            os.makedirs("plans/r06", exist_ok=True)
            df = build(name)
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # time build + action together, like bench.py's timed(): plan
            # construction is part of the cost (and for size-adaptive
            # small paths it's where the driver-side compute happens)
            t0 = time.time()
            df = build(name)
            if args.noop and name != "graph_build":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(json.dumps({name: ts, "min": min(ts)}), flush=True)
    print(json.dumps({"queries_min": {k: min(v) for k, v in out.items()},
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
