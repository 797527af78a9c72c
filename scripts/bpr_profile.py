#!/usr/bin/env python
"""Profile bpr_train_distributed at a large synthetic catalog to decide
whether the item-shard locality optimization (pre-partition items by
pmod(item, n_shards) and route blocks to shards) is worth building.

The epoch loop is: trace-replay touched-item discovery (applyInPandas)
-> touched.join(items) -> cogrouped SGD -> ordered delta fold. The
locality change only helps if the TOUCHED-JOIN (shuffle of item factors
to blocks) dominates epoch wall; this script measures that term in
isolation against the full epoch at a 10^6-item catalog, and checks
distributed-vs-broadcast parity at a catalog well past what the
broadcast path should be asked to hold per epoch.

Writes one JSON line; record as BENCH_bpr_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402  (module-level: pandas_udf type hints
#                      resolve annotations in MODULE globals, not locals)

N_ITEMS = int(os.environ.get("NOUS_BPR_ITEMS", 1_000_000))
N_USERS = int(os.environ.get("NOUS_BPR_USERS", 2_000))
PER_USER = 20
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 8))


def main() -> None:
    from pyspark.sql import functions as F

    from nous_spark.operators.link_prediction import (
        _prepare_per_user,
        bpr_train,
        bpr_train_distributed,
    )
    from nous_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bpr_profile")

    # synthetic interactions: each user draws PER_USER seeded items from
    # the 10^6 catalog (deterministic, skewless — locality is about
    # shuffle volume, not skew)
    inter = (
        spark.range(N_USERS * PER_USER)
        .select(
            (F.col("id") % N_USERS).alias("user"),
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(N_ITEMS)).alias("item"),
        )
        .dropDuplicates()
        .persist()
    )
    n_inter = inter.count()

    # --- full training epochs (the thing a user pays for) ---
    t0 = time.perf_counter()
    P, items = bpr_train_distributed(
        spark, inter, n_items=N_ITEMS, epochs=2, steps_per_user=30,
        k=8, n_blocks=CPUS, seed=5,
    )
    items.count()
    P.count()
    full_wall = time.perf_counter() - t0

    # --- the touched-join term in isolation (same trace the epoch runs):
    # replay epoch-0 touched discovery + join against the full item
    # factor table, nothing else ---
    from pyspark.sql import types as T

    from nous_spark.operators.link_prediction import _TOUCH_SCHEMA, _draw_trace

    per_user = _prepare_per_user(inter, None, 5).persist()
    per_user.count()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def init_p(user: pd.Series) -> pd.Series:
        return user.apply(
            lambda u: np.random.default_rng(5 * 100003 + int(u))
            .normal(0.0, 0.1, 8).tolist()
        )

    Pj = per_user.join(
        per_user.select("user", init_p("user").alias("factors")), "user"
    ).withColumn(
        "__block", F.pmod(F.xxhash64("user", F.lit(0)), F.lit(CPUS)).cast("int")
    )

    def touch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("user").reset_index(drop=True)
        blk = int(pdf["__block"].iloc[0]) if len(pdf) else 0
        _, touched = _draw_trace(pdf, N_ITEMS, 30, 5 + 7919)
        return pd.DataFrame({"block": blk, "item": sorted(touched)}) \
            if touched else pd.DataFrame({"block": pd.Series(dtype="int32"),
                                          "item": pd.Series(dtype="int64")})

    items_df = spark.range(N_ITEMS).select(
        F.col("id").alias("item"),
        F.lit([0.0] * 8).alias("qf"), F.lit(0.0).alias("b"),
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    touched = Pj.groupBy("__block").applyInPandas(touch, _TOUCH_SCHEMA)
    n_touched = touched.join(items_df, "item").count()
    join_wall = time.perf_counter() - t0

    # discovery alone (to subtract the applyInPandas trace-replay cost
    # that the locality change would NOT remove)
    t0 = time.perf_counter()
    touched2 = Pj.groupBy("__block").applyInPandas(touch, _TOUCH_SCHEMA)
    touched2.count()
    discover_wall = time.perf_counter() - t0

    join_only = max(join_wall - discover_wall, 0.0)
    per_epoch = full_wall / 2

    # --- parity vs the broadcast path at a 100k-item catalog (past the
    # size a per-epoch broadcast should be asked to carry at scale, still
    # runnable here). The two paths draw negatives differently (rejection
    # vs setdiff), so parity is METRIC-level — sampled AUC/HR within
    # tolerance — matching the contract the unit tests pin at toy size.
    from nous_spark.operators.link_prediction import (
        bpr_evaluate,
        bpr_evaluate_distributed,
    )

    small_items = 100_000
    inter_s = (
        inter.withColumn("item", F.col("item") % small_items)
        .dropDuplicates().persist()
    )
    test_s = inter_s.filter(F.pmod(F.col("user") + F.col("item"), F.lit(5)) == 0)
    train_s = inter_s.subtract(test_s).persist()
    Pd, itd = bpr_train_distributed(
        spark, train_s, n_items=small_items, epochs=2, steps_per_user=30,
        k=8, n_blocks=CPUS, seed=9,
    )
    md = bpr_evaluate_distributed(
        Pd, itd, train_s, test_s, n_items=small_items, top_n=10,
        sampled_negatives=20, seed=17,
    )
    Pb, Qb, Bb = bpr_train(
        spark, train_s, n_items=small_items, epochs=2, steps_per_user=30,
        k=8, n_blocks=CPUS, seed=9,
    )
    mb = bpr_evaluate(
        Pb, Qb, Bb, train_s, test_s, top_n=10,
        sampled_negatives=20, seed=17,
    )

    out = {
        "metric": "bpr_touched_join_share",
        "n_items": N_ITEMS,
        "n_users": N_USERS,
        "n_interactions": n_inter,
        "cpus": CPUS,
        "epoch_wall_sec": round(per_epoch, 3),
        "touched_discovery_sec": round(discover_wall, 3),
        "touched_join_sec_incl_discovery": round(join_wall, 3),
        "touched_join_only_sec": round(join_only, 3),
        "touched_join_share_of_epoch": round(join_only / max(per_epoch, 1e-9), 3),
        "n_touched_item_rows": n_touched,
        "parity_n_items": small_items,
        "parity_distributed_metrics": {k2: round(v, 4) for k2, v in md.items()},
        "parity_broadcast_metrics": {k2: round(v, 4) for k2, v in mb.items()},
        "parity_auc_delta": round(abs(md["AUC"] - mb["AUC"]), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
