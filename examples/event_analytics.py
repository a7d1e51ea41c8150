"""Event-analytics walkthrough: the product/ops questions an event table
answers end-to-end — daily volume control charts (CUSUM, batch AND the
live streaming monitor), user-lifetime survival (Kaplan-Meier), and the
seasonal/anomaly context they sit in.

Run:  python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from nonconsumptive_spark.queries import all_queries, load
    from nonconsumptive_spark.session import get_spark
    from nonconsumptive_spark.streaming.cusum import (
        cusum_series,
        merge_cusum,
        series,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics")

    # 1. CUSUM control chart over daily volume (batch form)
    reg = all_queries()
    cusum = reg["q_cusum_daily"].spark_fn(spark, sf_dir)
    flagged = cusum.filter("flagged").count()
    print(f"== CUSUM daily control chart ({cusum.count()} days, "
          f"{flagged} flagged) ==")
    cusum.orderBy("d").show(8, truncate=False)

    # 2. Kaplan-Meier survival over user lifetimes
    km = reg["q_kaplan_meier"].spark_fn(spark, sf_dir)
    print("== Kaplan-Meier user-lifetime survival ==")
    km.orderBy("dur").show(10, truncate=False)

    # 2b. the same survival analysis per signup cohort
    kmc = reg["q_kaplan_meier_cohorts"].spark_fn(spark, sf_dir)
    print("== Kaplan-Meier per signup cohort ==")
    kmc.orderBy("cohort", "dur").show(8, truncate=False)

    # 3. the SAME CUSUM statistics maintained live: fold the daily series
    #    in three chunks through the versioned-commit monitor and show
    #    stream == batch
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy("d")
    )
    days = [r["d"] for r in daily.select("d").collect()]
    cut1, cut2 = days[len(days) // 3], days[2 * len(days) // 3]
    # fixed target = the corpus mean as a rational, matching the batch
    tot = daily.agg(F.count("*").alias("n"), F.sum("c").alias("s")).first()
    tnum, tden = int(tot["s"]), int(tot["n"])
    h = 4 * int(tot["s"])

    with tempfile.TemporaryDirectory() as tmp:
        table = str(Path(tmp) / "cusum")
        for e, pred in enumerate([daily.d < cut1,
                                  (daily.d >= cut1) & (daily.d < cut2),
                                  daily.d >= cut2]):
            merge_cusum(daily.filter(pred), table, tnum, tden, h,
                        epoch_id=e)
        live = series(spark, table).select(
            "d", "c", "cum", "cusum_pos", "cusum_neg", "flagged")
        batch = cusum_series(daily, tnum, tden, h).select(
            "d", "c", "cum", "cusum_pos", "cusum_neg", "flagged")
        same = {tuple(r) for r in live.collect()} \
            == {tuple(r) for r in batch.collect()}
        print(f"== streaming CUSUM (3 epochs) == stream == batch: {same}")
        assert same

    spark.stop()


if __name__ == "__main__":
    main()
