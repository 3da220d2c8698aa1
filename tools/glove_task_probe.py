"""Task-level metrics for the fused GloVe epoch's kernel stage.

Identifies WHERE 8-core scaling dies inside stage time: per-task duration
spread, GC, shuffle fetch wait, python-boundary time (executorRunTime -
cpuTime), scheduler delay. Usage:

    python tools/glove_task_probe.py <cores> <n_entries> [n_shards]
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
        preshard_cooc,
        shards_for,
        train_epoch,
    )

    spark = get_spark(
        "glove-task-probe",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    vocab = max(25_000, n_entries // 40)
    raw = synthetic_cooc(spark, n_entries, vocab).persist()
    raw.count()
    nodes = raw.select(F.col("i").alias("node_id")).union(raw.select("j")).distinct()
    if n_shards is None:
        n_shards = shards_for(n_entries)
    cooc = preshard_cooc(raw, seed=42, n_shards=n_shards).persist()
    cooc.count()
    params = init_params_df(nodes, 32, 42, "adagrad").persist()
    params.count()
    raw.unpersist()

    kw = dict(dim=32, method="adagrad", cost="glove", max_x=5.0, seed=42,
              n_shards=n_shards, batch=4096, eager_cost=False)
    # mirror optimize(): static plan for the epochs under measurement
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    warm, _ = train_epoch(cooc, params, iteration=0, **kw)
    warm.write.mode("overwrite").format("noop").save()

    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.loads(r.read())

    seen = {s["stageId"] for s in get("stages?status=complete")}
    t0 = time.perf_counter()
    new_params, obs = train_epoch(cooc, params, iteration=1, **kw)
    new_params.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    _ = obs.get["cost"]
    time.sleep(1.0)

    fresh = sorted(
        (s for s in get("stages?status=complete") if s["stageId"] not in seen),
        key=lambda s: s["stageId"],
    )
    for s in fresh:
        sid, att = s["stageId"], s["attemptId"]
        tasks = get(f"stages/{sid}/{att}/taskList?length=500")
        rows = []
        for t in tasks:
            m = t.get("taskMetrics") or {}
            sr = (m.get("shuffleReadMetrics") or {})
            sw = (m.get("shuffleWriteMetrics") or {})
            rows.append({
                "dur_s": round(t.get("duration", 0) / 1000, 2),
                "run_s": round(m.get("executorRunTime", 0) / 1000, 2),
                "cpu_s": round(m.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(m.get("jvmGcTime", 0) / 1000, 2),
                "deser_s": round(m.get("executorDeserializeTime", 0) / 1000, 2),
                "fetch_wait_s": round(sr.get("fetchWaitTime", 0) / 1000, 2),
                "write_time_s": round(sw.get("writeTime", 0) / 1e9, 2),
                "sr_mb": round(sr.get("totalBytesRead") or (sr.get("localBytesRead", 0) + sr.get("remoteBytesRead", 0)), -4) / 1e6,
                "sw_mb": round(sw.get("bytesWritten", 0) / 1e6, 1),
                "launch": (t.get("launchTime", "") or "")[-12:],
            })
        rows.sort(key=lambda r: -r["dur_s"])
        big = [r for r in rows if r["dur_s"] >= 0.3]
        small = [r for r in rows if r["dur_s"] < 0.3]
        print(f"STAGE {sid} tasks={len(rows)} (big={len(big)}, small={len(small)}, "
              f"small_dur_sum={round(sum(r['dur_s'] for r in small), 1)}s) "
              f"name={s.get('name', '')[:90]!r}")
        for r in big[:24]:
            print("  TASK " + json.dumps(r))
    print("WALL " + json.dumps({"cores": cores, "wall_s": round(wall, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
