"""Count Spark jobs (and stages) an entry submits — a weather-independent
fixed-cost metric for entries dominated by per-action overhead at bench SFs.

Usage: python tools/count_jobs.py [sf_dir] name [name ...]

Reads the DAGScheduler's job/stage id counters before and after each entry,
so the number is exact regardless of how slow the box is. Model/stats warm
is done once up front (like bench.py) so the counts reflect the entry, not
the shared warm phase.
"""
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir = args.pop(0)
    from naru_spark.session import get_spark
    from __spark_entry__ import queries

    spark = get_spark("count_jobs")
    reg = queries()
    dag = spark.sparkContext._jsc.sc().dagScheduler()

    from naru_spark.entry_model import warm_model_cache
    from naru_spark.entry_pipeline import warm_pipeline_caches

    warm_model_cache(spark, sf_dir)
    warm_pipeline_caches(spark, sf_dir)

    for name in args:
        fn = reg[name]
        j0, s0 = int(dag.numTotalJobs()), int(dag.nextStageId())
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        j1, s1 = int(dag.numTotalJobs()), int(dag.nextStageId())
        print(f"{name}: jobs={j1 - j0} stages={s1 - s0} wall={wall:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
