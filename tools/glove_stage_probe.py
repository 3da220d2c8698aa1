"""Per-stage wall/CPU attribution for ONE fused GloVe epoch.

Runs a single eager_cost=False epoch at the given core count and dumps
every stage's wall time, executor-run time, task count, and shuffle bytes
from the Spark UI REST API — the evidence layer for deciding WHERE the
2->8-core scaling loss lives (scheduling barriers vs skewed tasks vs
Python/Arrow serial work).

    python tools/glove_stage_probe.py <cores> <n_entries> [n_shards]

Prints STAGE lines + one PROBE summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.glove_scale_probe import synthetic_cooc  # noqa: E402


def main():
    cores = int(sys.argv[1])
    n_entries = int(sys.argv[2])
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from graph_embeddings_spark.session import get_spark
    from graph_embeddings_spark.glove.train import (
        init_params_df,
        shards_for,
        train_epoch,
    )

    spark = get_spark(
        "glove-stage-probe",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    vocab = max(25_000, n_entries // 40)
    cooc = synthetic_cooc(spark, n_entries, vocab).persist()
    co_count = cooc.count()
    nodes = cooc.select(F.col("i").alias("node_id")).union(cooc.select("j")).distinct()
    if n_shards is None:
        n_shards = shards_for(co_count)
    params = init_params_df(nodes, 32, 42, "adagrad").persist()
    params.count()

    # warm epoch: codegen + worker spin-up paid outside the measured one
    warm, obs0 = train_epoch(
        cooc, params, dim=32, method="adagrad", cost="glove", max_x=5.0,
        iteration=0, seed=42, n_shards=n_shards, batch=4096, eager_cost=False,
    )
    warm.write.mode("overwrite").format("noop").save()

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.loads(r.read())

    seen = {s["stageId"] for s in stages()}

    t0 = time.perf_counter()
    new_params, obs = train_epoch(
        cooc, params, dim=32, method="adagrad", cost="glove", max_x=5.0,
        iteration=1, seed=42, n_shards=n_shards, batch=4096, eager_cost=False,
    )
    new_params.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    _ = obs.get["cost"]

    time.sleep(1.0)
    fresh = [s for s in stages() if s["stageId"] not in seen]
    fresh.sort(key=lambda s: s["stageId"])
    total_run = 0
    for s in fresh:
        sub = s.get("submissionTime", "")
        first = s.get("firstTaskLaunchedTime", "")
        comp = s.get("completionTime", "")
        run_ms = s.get("executorRunTime", 0)
        total_run += run_ms
        print("STAGE " + json.dumps({
            "id": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "exec_run_s": round(run_ms / 1000, 2),
            "exec_cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "submit": sub[-12:],
            "first_task": first[-12:],
            "complete": comp[-12:],
        }))
    print("PROBE " + json.dumps({
        "cores": cores, "entries": co_count, "n_shards": n_shards,
        "wall_s": round(wall, 2), "n_stages": len(fresh),
        "sum_exec_run_s": round(total_run / 1000, 2),
        "ideal_wall_s": round(total_run / 1000 / cores, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
