"""Extra benchmarks for the optimization round (guide §1: measure first).

bench.py is FROZEN for driver measurement; everything exploratory lives
here. Subcommands:

  query <name> [reps]     one declared query, noop sink, warm best-of-N
  queries [reps]          all bench.py headline queries, noop sink
  explain <name> <file>   formatted physical plan -> file
  frontier [reps]         the crawl_frontier_1m pipeline (same as bench.py)
  wave [n] [reps]         one engine wave, GRAWLER_TIMING honored
  ann [reps]              sim_ann_lsh_d512_20k (same as bench.py)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "a4_wave_metrics", "a1_word_freq", "f4_politeness_topk",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_cosine_topk", "text_quality", "text_langid",
]


def timed(fn, reps: int) -> dict:
    samples = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    return {
        "min": round(samples[0], 3),
        "median": round(statistics.median(samples), 3),
        "max": round(samples[-1], 3),
        "samples": [round(s, 3) for s in samples],
    }


def get_session(app: str):
    from grawler.session import get_spark

    spark = get_spark(app)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_query(spark, name: str, reps: int) -> dict:
    import __spark_entry__ as entry

    q = entry.queries()[name]
    spark.sparkContext.setJobDescription(f"bench_extra: {name}")

    def one():
        noop(q(spark, SF_DIR))

    one()  # warm
    st = timed(one, reps)
    spark.sparkContext.setJobDescription(None)
    return st


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "wave":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        os.environ["GRAWLER_BENCH_REPEATS"] = str(reps)
        import bench

        spark = get_session("bench-extra-wave")
        st, rate = bench.bench_wave(spark, n, repeats=reps, warmup=True)
        print(json.dumps({"wave": n, "stats": st, "rate": round(rate)}))
        return

    spark = get_session("bench-extra")
    if cmd == "query":
        name = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        print(json.dumps({name: run_query(spark, name, reps)}))
    elif cmd == "queries":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        out = {}
        for name in HEADLINE:
            out[name] = run_query(spark, name, reps)
            print(name, json.dumps(out[name]), flush=True)
        print(json.dumps(out))
    elif cmd == "explain":
        import __spark_entry__ as entry

        name, outfile = sys.argv[2], sys.argv[3]
        df = entry.queries()[name](spark, SF_DIR)
        with open(outfile, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {outfile}")
    elif cmd == "frontier":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        os.environ["GRAWLER_BENCH_REPEATS"] = str(reps)
        import bench

        st, rate = bench.bench_frontier(spark)
        split = bench.bench_frontier_split(spark)
        print(json.dumps({"frontier": st, "rate": round(rate),
                          "split": split}))
    elif cmd == "ann":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        os.environ["GRAWLER_BENCH_REPEATS"] = str(reps)
        import bench

        st, recall = bench.bench_ann_d512(spark)
        print(json.dumps({"ann": st, "recall": recall}))
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
