"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced by running the SAME job on the SAME input at 8 and 32 cores (task
brief proxy).  Each level runs in a SUBPROCESS pinned with ``taskset`` to
exactly that many CPUs — without pinning, local[8]'s Python UDF workers
(separate OS processes, not bounded by local[N]) silently spill onto the other
24 idle cores and corrupt the comparison.

Job: deterministic synthetic pages -> fused html->text->triple extraction ->
dedup -> count.  Prints one JSON line with throughput at both levels and
scaling efficiency throughput(4N) / (4 * throughput(N)).

Run:  python tools/scaling_bench.py [n_pages]     (default 200000)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP = r"""
import sys
sys.path.insert(0, {repo!r})
from climatemind_ontology_processing_spark.session import get_spark
from climatemind_ontology_processing_spark.sources.pages import pages_df
spark = get_spark(app_name="cmkg-scale-setup", master="local[32]",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages_df(spark, {n_pages}, seed=42, partitions=256).write.mode(
    "overwrite").parquet({path!r})
spark.stop()
print("SETUP_DONE")
"""

# production shape: stored pages table -> fused extract -> dedup -> count.
# maxPartitionBytes lowered so the (small) synthetic parquet still yields
# enough input splits to feed every core; at real 100TB scale the default
# 128MB splits already give thousands of tasks.
SINGLE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from climatemind_ontology_processing_spark.plans.pipeline import triples_from_pages
from climatemind_ontology_processing_spark.session import get_spark

cores, n_pages = {cores}, {n_pages}
spark = get_spark(app_name=f"cmkg-scale-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores * 2, 8),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "4m",
                               "spark.sql.files.openCostInBytes": "0",
                               # keep post-shuffle parallelism for the dedup
                               # window (AQE would coalesce ~100MB of triples
                               # into 1-2 partitions -> serial tail)
                               "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"}})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({path!r})
from climatemind_ontology_processing_spark.functions.triples import (
    extract_triples_from_html)
from climatemind_ontology_processing_spark.sources.dictionary import alias_map
n_raw = extract_triples_from_html(pages, alias_map()).count()  # raw volume
# warm-up: ONE FULL untimed pass so every python worker on every core is
# forked, has imported its deps, and JIT/codegen is hot — steady-state
# throughput is what a long-running 100TB job sees
triples_from_pages(pages).count()
reps = []
for _ in range(3):
    t0 = time.time()
    n_unique = triples_from_pages(pages).count()
    reps.append(time.time() - t0)
med = sorted(reps)[1]
print(json.dumps({{"cores": cores, "sec": round(med, 3),
                   "reps_sec": [round(r, 3) for r in reps],
                   "n_triples_raw": n_raw, "n_triples_unique": n_unique,
                   "triples_per_sec": round(n_raw / med, 1),
                   "pages_per_sec": round(n_pages / med, 1)}}))
spark.stop()
"""


def run_once(cores: int, n_pages: int, path: str) -> dict:
    cmd = [sys.executable, "-c", SINGLE.format(repo=REPO, cores=cores,
                                               n_pages=n_pages, path=path)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    # 5 passes (probe + warm-up + 3 reps); budget scales with input size
    budget = max(500, int(n_pages / 1500))
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=budget)
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def hardware_ceiling(n_small: int, n_large: int) -> float:
    """Measure what THIS HOST gives a perfectly parallel workload from
    n_small -> n_large pinned cores (pure-CPU multiprocessing, no Spark).

    Cloud VMs boost clocks when few cores are active, so even embarrassingly
    parallel work shows < 1.0 'efficiency' at high core counts — the workload
    efficiency must be read against this ceiling, not against 1.0.
    """
    import multiprocessing as mp
    import time

    def measure(procs: int) -> float:
        code = ("import time\n"
                "t=time.time()\n"
                "x=1\n"
                "for _ in range(12_000_000): x=(x*31+7)%1000003\n"
                "print(time.time()-t)")
        cmd = ["taskset", "-c", f"0-{procs - 1}"] if shutil.which("taskset") else []
        t0 = time.time()
        ps = [subprocess.Popen(cmd + [sys.executable, "-c", code],
                               stdout=subprocess.DEVNULL) for _ in range(procs)]
        for p in ps:
            p.wait()
        return procs / (time.time() - t0)  # aggregate units of work / sec

    r_small = measure(n_small)
    r_large = measure(n_large)
    return round(r_large / (r_small * n_large / n_small), 3)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    factor = n_large / n_small
    path = f"/tmp/cmkg_scale_pages_{n_pages}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run([sys.executable, "-c",
                        SETUP.format(repo=REPO, n_pages=n_pages, path=path)],
                       check=True, capture_output=True, text=True, timeout=500)
    ceiling = hardware_ceiling(n_small, n_large)
    small = run_once(n_small, n_pages, path)
    large = run_once(n_large, n_pages, path)
    eff = round(large["triples_per_sec"] / (factor * small["triples_per_sec"]), 3)
    print(json.dumps({
        "metric": "scaling_efficiency_N_to_4N",
        "n_pages": n_pages,
        "cpu_pinned": shutil.which("taskset") is not None,
        "cores_small": n_small,
        "cores_large": n_large,
        "small": small,
        "large": large,
        "speedup": round(large["triples_per_sec"] / small["triples_per_sec"], 2),
        "scaling_efficiency": eff,
        "hardware_ceiling_efficiency": ceiling,
        "efficiency_vs_hardware_ceiling": round(min(eff / ceiling, 1.0), 3)
        if ceiling else None,
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
