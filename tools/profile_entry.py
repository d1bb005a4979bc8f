"""Per-entry measurement harness (guide §1: measure first).

Runs named registry entries in one warmed session and reports, per entry:
wall seconds per repeat, and optionally a cProfile dump and/or the
``.explain("formatted")`` plan written to plans/<tag>/<name>_<suffix>.txt.

Usage:
  python tools/profile_entry.py name1,name2 [--sf DIR] [--repeat N]
      [--cprofile] [--explain plans/r15 --suffix before] [--warm]

The timed action is df.count() — the bench's methodology — so numbers here
compare 1:1 with bench.py walls.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = "/root/testdata/sf0.1"
    repeat = 1
    do_prof = "--cprofile" in sys.argv
    do_warm = "--warm" in sys.argv
    explain_dir = None
    suffix = "before"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        elif a == "--repeat":
            repeat = int(sys.argv[i + 1])
        elif a == "--explain":
            explain_dir = sys.argv[i + 1]
        elif a == "--suffix":
            suffix = sys.argv[i + 1]

    from naru_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("profile_entry")
    from naru_spark.sources import load_table

    load_table(spark, "lineitem", sf_dir).count()
    if do_warm:
        from naru_spark.entry_model import warm_model_cache
        from naru_spark.entry_pipeline import warm_pipeline_caches

        t0 = time.time()
        warm_model_cache(spark, sf_dir)
        warm_pipeline_caches(spark, sf_dir)
        print(f"# warm: {time.time() - t0:.2f}s", file=sys.stderr)

    qmap = entry_mod.queries()
    for name in names:
        fn = qmap[name]
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            prof = cProfile.Profile() if do_prof and r == repeat - 1 else None
            t0 = time.time()
            if prof:
                prof.enable()
            df = fn(spark, sf_dir)
            n = df.count()
            if prof:
                prof.disable()
            wall = time.time() - t0
            print(f"{name} rep{r}: {wall:.3f}s ({n} rows)")
            if prof:
                s = io.StringIO()
                pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(45)
                print(s.getvalue())
            if explain_dir and r == 0:
                os.makedirs(explain_dir, exist_ok=True)
                import contextlib

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                out = os.path.join(explain_dir, f"{name}_{suffix}.txt")
                with open(out, "w") as fh:
                    fh.write(buf.getvalue())
                print(f"# plan -> {out}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
