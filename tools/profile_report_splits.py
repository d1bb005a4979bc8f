"""Micro-profiler for estimator_report's slowest splits (r16 items 6/7):
times the `heuristic` and `psample_transformer_128` estimators in isolation
over the seeded 30-query workload, with optional cProfile, in one warmed
session. Same construction as q_estimator_report, so ms/q here compares
1:1 with the bench's estimator_report_split numbers.

Usage: python tools/profile_report_splits.py [--sf DIR] [--repeat N]
           [--cprofile] [--which heuristic,transformer]
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
    sf_dir = "/root/testdata/sf0.1"
    repeat = 2
    do_prof = "--cprofile" in sys.argv
    which = {"heuristic", "transformer"}
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        elif a == "--repeat":
            repeat = int(sys.argv[i + 1])
        elif a == "--which":
            which = set(sys.argv[i + 1].split(","))

    from naru_spark.session import get_spark

    spark = get_spark("profile_report_splits")
    from naru_spark.entry_model import _fitted, _fitted_variants, _named
    from naru_spark.entry_queries import workload
    from naru_spark.estimators import Heuristic
    from naru_spark.estimators.progressive import ProgressiveSampling

    t0 = time.time()
    df, enc, meta, model = _fitted(spark, sf_dir)
    wl = list(workload())
    print(f"# fit+workload: {time.time() - t0:.2f}s, {len(wl)} queries", file=sys.stderr)

    ests = []
    if "heuristic" in which:
        ests.append(Heuristic(df, meta))
    if "transformer" in which:
        transformer, _ = _fitted_variants(spark, sf_dir)
        ests.append(
            _named(ProgressiveSampling(transformer, num_samples=128, seed=7),
                   "psample_transformer_128")
        )

    for est in ests:
        vals_ref = None
        for r in range(repeat):
            prof = cProfile.Profile() if do_prof and r == repeat - 1 else None
            t0 = time.time()
            if prof:
                prof.enable()
            vals = est.query_batch(wl)
            if prof:
                prof.disable()
            ms = (time.time() - t0) * 1e3 / len(wl)
            print(f"{est.name} rep{r}: {ms:.2f} ms/q  ({(time.time()-t0):.3f}s total)")
            if vals_ref is None:
                vals_ref = vals
            else:
                assert vals == vals_ref, f"{est.name}: repeat diverged"
            if prof:
                s = io.StringIO()
                pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(40)
                print(s.getvalue())


if __name__ == "__main__":
    main()
