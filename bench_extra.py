"""Round-7 optimization measurement harness (guide §1.4): times
individual declared queries with the noop sink under the SAME session
configuration bench.py's _time_queries uses, and captures
.explain('formatted') plans. bench.py itself stays frozen; this file
exists so before/after numbers and plan diffs can be produced per query
without paying the full gated bench.

Usage:
    python bench_extra.py time  [sf_dir] [query ...]   # noop-sink timings
    python bench_extra.py plan  [sf_dir] [query ...]   # print plans
    python bench_extra.py plansave <outdir> <suffix> [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = (
    "extract_synth", "token_counts", "fingerprints", "exact_dedup",
    "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "quality_scores", "lang_id", "ann_bruteforce", "ann_lsh",
    "substring_dedup", "substring_dedup_hashed", "gopher_quality",
    "line_dedup",
)


def _session():
    from go_trafilatura_spark.pipeline import build_session

    return build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def _parse_args(argv):
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in argv:
        if os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)
    return sf_dir, tuple(names) or DEFAULT_QUERIES


def cmd_time(argv):
    import __spark_entry__ as entrymod

    sf_dir, names = _parse_args(argv)
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    spark = _session()
    qs = entrymod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples}
        print(f"{name}: best={min(samples)} samples={samples}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "load1": os.getloadavg()[0],
                      "timings": out}))
    spark.stop()


def _plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def cmd_plan(argv, outdir=None, suffix=None):
    import __spark_entry__ as entrymod

    sf_dir, names = _parse_args(argv)
    spark = _session()
    qs = entrymod.queries()
    for name in names:
        txt = _plan_text(qs[name](spark, sf_dir))
        if outdir:
            os.makedirs(outdir, exist_ok=True)
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{suffix}.txt "
                  f"({txt.count('Exchange')} Exchange mentions)")
        else:
            print(f"===== {name} =====\n{txt}\n")
    spark.stop()


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "plan":
        cmd_plan(sys.argv[2:])
    elif cmd == "plansave":
        cmd_plan(sys.argv[4:], outdir=sys.argv[2], suffix=sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
