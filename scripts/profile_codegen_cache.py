"""Session-state root cause, hypothesis 2: codegen compile-cache
eviction.

profile_session_state.py refuted hypothesis 1 (GC debt): forcing
System.gc() after every query holds driver heap at ~100 MB and cached
RDDs at 0, yet x2_ngram_jaccard stays at its full-session 1.8-2.0 s
instead of the dedicated-session 1.2 s (BENCH_profile_njac_r12.json).

Hypothesis 2: the generated-class cache behind whole-stage codegen
(``CodeGenerator.cache``, sized by ``spark.sql.codegen.cache.maxEntries``,
default 100 on this Spark 4.1) thrashes. Mechanism evidence from the
first instrumented run: the 14 bench queries compile ~150 generated
classes per rep EVERY rep (CodegenMetrics compile count grows linearly,
cache entry count pinned at its 100 cap) — i.e. by the time rep 2 of
any query plans, its classes have been evicted and Janino recompiles
all of them (~0.8 s of driver-side compile per rep). A dedicated
session (one query's classes only) never pays this, which is exactly
the session-state signature r11/r12 kept measuring on x2_ngram_jaccard
and p7_dns_parse.

Two protocol gotchas this script handles (both bit the first version):

- ``CodeGenerator.cache`` is a JVM-static created on first use with
  the size from the ACTIVE session's conf — and the py4j gateway JVM
  SURVIVES ``spark.stop()`` within one Python process, so a second
  in-process "session" inherits the first one's cache object (the
  conf change silently no-ops and the warm cache contaminates the
  control). Every session here runs in its own subprocess.
- sessions are interleaved control/bigcache/control/bigcache so host
  drift cannot masquerade as the effect.

Verdict criteria: bigcache shows (a) cache entries well above 100 and
near-zero rep-2+ compile deltas where control shows ~150/rep, and
(b) a lower total in both interleaved pairs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = """
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from adguard2clickhouse_spark.session import get_spark
from bench import BENCH_QUERIES, REPS

label, conf_json, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
extra_conf = json.loads(conf_json)
spark = get_spark(app_name="profile-codegen-" + label, extra_conf=extra_conf)
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()

jvm = spark.sparkContext._jvm
cache = (jvm.org.apache.spark.sql.catalyst.expressions.codegen
         .__getattr__("CodeGenerator$").__getattr__("MODULE$")).cache()
metrics = (jvm.org.apache.spark.metrics.source
           .__getattr__("CodegenMetrics$").__getattr__("MODULE$"))
hist = metrics.METRIC_COMPILATION_TIME()

def snap(at):
    return {{"at": at, "cache_entries": int(cache.size()),
             "compile_count": int(hist.getCount()),
             "compile_total_ms": round(
                 hist.getSnapshot().getMean() * hist.getCount(), 1)}}

warm_dir = "/root/testdata/sf0.001"
for name in BENCH_QUERIES:
    qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
snaps = [snap("after_warmup")]

runs = {{name: [] for name in BENCH_QUERIES}}
for rep in range(REPS):
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs[name].append(round(time.time() - t0, 3))
    snaps.append(snap("after_rep%d" % rep))
spark.stop()
print(json.dumps({{
    "label": label, "extra_conf": extra_conf,
    "medians": {{n: round(statistics.median(r), 3) for n, r in runs.items()}},
    "total": round(sum(statistics.median(r) for r in runs.values()), 3),
    "codegen": snaps, "runs": runs}}))
"""


def run_session(label: str, extra_conf: dict[str, str], sf_dir: str) -> dict:
    child = _CHILD.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", child, label, json.dumps(extra_conf), sf_dir],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        check=True,
    )
    return json.loads(out.stdout.splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = {"spark.sql.codegen.cache.maxEntries": "2000"}
    out = [
        run_session("control_1", {}, sf_dir),
        run_session("bigcache_1", big, sf_dir),
        run_session("control_2", {}, sf_dir),
        run_session("bigcache_2", big, sf_dir),
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
