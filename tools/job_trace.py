"""Per-job trace for one entry: job id, description/callsite, duration, stages.

Usage: python tools/job_trace.py [sf_dir] name

Reads the AppStatusStore after running the entry (works with UI disabled —
the status store is always populated), so each Spark job the entry submitted
is listed with its callsite and wall. Weather-immune attribution: job COUNTS
and callsites identify redundant actions regardless of box speed.
"""
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir = args.pop(0)
    name = args[0]
    from naru_spark.session import get_spark
    from __spark_entry__ import queries

    spark = get_spark("job_trace")
    from naru_spark.entry_model import warm_model_cache
    from naru_spark.entry_pipeline import warm_pipeline_caches

    warm_model_cache(spark, sf_dir)
    warm_pipeline_caches(spark, sf_dir)

    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()
    j0 = int(dag.numTotalJobs())
    t0 = time.time()
    df = queries()[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    j1 = int(dag.numTotalJobs())

    store = sc._jsc.sc().statusStore()
    tracker = sc.statusTracker()

    def stage_name(sid: int) -> str:
        info = tracker.getStageInfo(sid)
        return info.name if info else "?"

    jobs = store.jobsList(None)
    rows = []
    it = jobs.iterator()
    while it.hasNext():
        j = it.next()
        jid = j.jobId()
        if jid < j0 or jid >= j1:
            continue
        _sit = j.stageIds().iterator()  # scala Seq -> python list
        sids = []
        while _sit.hasNext():
            sids.append(int(str(_sit.next())))
        sids.sort()
        # the LAST stage of a job is its result stage — the action callsite
        site = stage_name(sids[-1]) if sids else "?"
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append((jid, dur, j.numTasks(), len(sids), site[:120]))
    rows.sort()
    print(f"# {name}: jobs={j1 - j0} wall={wall:.2f}s")
    agg = {}
    for jid, dur, ntasks, nstages, site in rows:
        print(f"  job {jid}: {dur if dur is not None else -1:6.2f}s tasks={ntasks:3d} stages={nstages}  {site}")
        k = site
        n, tot = agg.get(k, (0, 0.0))
        agg[k] = (n + 1, tot + (dur or 0.0))
    print("# --- by callsite:")
    for site, (n, tot) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {n:3d} jobs {tot:7.2f}s  {site}")


if __name__ == "__main__":
    main()
