"""Split the fused GloVe epoch's kernel-stage task time into components.

Monkeypatches the cogroup kernel (train_fn) to log, per invocation:
pid, fresh-worker flag, rows in, entries, kernel seconds (train_shard),
whole-fn seconds. Local mode => workers share /tmp with the driver.
Also dumps every stage of the measured epoch with task-count + bytes so
stage attribution is read off the API, not inferred.

Usage: python tools/epoch_breakdown_probe.py <cores> <n_entries> [n_shards]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.glove_scale_probe import synthetic_cooc  # noqa: E402

LOG_DIR = "/tmp/glove_epoch_breakdown"


_KERNEL_TIME: dict[str, float] = {}


def _timed_train_shard(orig_shard):
    """Driver-side patch of train.py's `train_shard` global BEFORE
    _make_train_fn builds its closure: cloudpickle captures by-value
    globals at closure build time, so patching inside the worker (the
    first version of this probe) never intercepts the call."""

    def shard_timed(*a, **kw):
        import time as _time

        ks = _time.perf_counter()
        out = orig_shard(*a, **kw)
        _KERNEL_TIME["k"] = _time.perf_counter() - ks
        return out

    return shard_timed


def _instrumented_make_train_fn(orig_make):
    def make(dim, method, cost, max_x, iteration, batch):
        inner = orig_make(dim, method, cost, max_x, iteration, batch)

        def timed(cooc_tbl, params_tbl):
            import json as _json
            import os as _os
            import time as _time

            import graph_embeddings_spark.glove.train as _t

            fresh = not getattr(_t, "_probe_worker_seen", False)
            _t._probe_worker_seen = True
            _KERNEL_TIME.pop("k", None)
            t0 = _time.perf_counter()
            res = inner(cooc_tbl, params_tbl)
            dt = _time.perf_counter() - t0
            rec = {
                "pid": _os.getpid(),
                "fresh_worker": fresh,
                "param_rows": params_tbl.num_rows,
                "entries": cooc_tbl.num_rows,
                "kernel_s": round(_KERNEL_TIME.get("k", 0.0), 3),
                "fn_s": round(dt, 3),
                "iteration": iteration,
            }
            with open(f"{LOG_DIR}/{_os.getpid()}_{_time.monotonic_ns()}.json", "w") as f:
                f.write(_json.dumps(rec))
            return res

        return timed

    return make


def main():
    cores = int(sys.argv[1])
    n_entries = int(sys.argv[2])
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else None

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)

    from pyspark.sql import functions as F

    import graph_embeddings_spark.glove.train as t
    from graph_embeddings_spark.session import get_spark

    t.train_shard = _timed_train_shard(t.train_shard)
    t._make_train_fn = _instrumented_make_train_fn(t._make_train_fn)

    spark = get_spark(
        "epoch-breakdown", cores=cores, shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    vocab = max(25_000, n_entries // 40)
    raw = synthetic_cooc(spark, n_entries, vocab).persist()
    raw.count()
    nodes = raw.select(F.col("i").alias("node_id")).union(raw.select("j")).distinct()
    if n_shards is None:
        n_shards = t.shards_for(n_entries)
    cooc = t.preshard_cooc(raw, seed=42, n_shards=n_shards).persist()
    cooc.count()
    params = t.init_params_df(nodes, 32, 42, "adagrad").persist()
    params.count()
    raw.unpersist()

    kw = dict(dim=32, method="adagrad", cost="glove", max_x=5.0, seed=42,
              n_shards=n_shards, batch=4096, eager_cost=False)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    warm, _ = t.train_epoch(cooc, params, iteration=0, **kw)
    warm.write.mode("overwrite").format("noop").save()
    for f in glob.glob(f"{LOG_DIR}/*.json"):
        os.unlink(f)

    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.loads(r.read())

    seen = {s["stageId"] for s in get("stages?status=complete")}
    t0 = time.perf_counter()
    new_params, obs = t.train_epoch(cooc, params, iteration=1, **kw)
    new_params.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    _ = obs.get["cost"]
    time.sleep(1.0)

    fresh_stages = sorted(
        (s for s in get("stages?status=complete") if s["stageId"] not in seen),
        key=lambda s: s["stageId"],
    )
    for s in fresh_stages:
        print("STAGE " + json.dumps({
            "id": s["stageId"],
            "tasks": s.get("numCompleteTasks"),
            "runtime_s": round(s.get("executorRunTime", 0) / 1000, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "name": s.get("name", "")[:60],
        }))

    recs = []
    for fp in glob.glob(f"{LOG_DIR}/*.json"):
        with open(fp) as f:
            recs.append(json.load(f))
    recs.sort(key=lambda r: -r["fn_s"])
    tot_fn = sum(r["fn_s"] for r in recs)
    tot_k = sum(r["kernel_s"] for r in recs)
    n_fresh = sum(r["fresh_worker"] for r in recs)
    print("KERNEL_CALLS " + json.dumps({
        "calls": len(recs), "fresh_workers": n_fresh,
        "sum_fn_s": round(tot_fn, 2), "sum_kernel_s": round(tot_k, 2),
        "pids": len({r["pid"] for r in recs}),
    }))
    for r in recs[:12]:
        print("  CALL " + json.dumps(r))
    print("WALL " + json.dumps({"cores": cores, "wall_s": round(wall, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
