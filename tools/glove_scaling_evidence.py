"""GloVe-epoch scaling evidence (north_rule two-cluster-size stand-in).

Alternates fresh-JVM glove_scale_probe children at local[2] and local[8]
over `rounds` rounds on the SAME synthetic co-occurrence (4M entries by
default — compute-dominated; the r2 bench anti-scaled at 63k entries where
fixed per-epoch overhead dwarfed the kernel). Best trial per core count is
the estimator (shared host: alternation exposes both configs to the same
co-tenant load distribution).

Two hardware ceilings are measured in the same run:
  * spin   — N parallel pure-Python spin processes (raw CPU; what r2 used)
  * kernel — N parallel processes each running the REAL shard kernel on
    its own synthetic shard. The epoch's tasks are memory-bound numpy, so
    concurrent processes contend for DRAM bandwidth long before raw CPU
    saturates; this is the honest "perfect parallel code" bound for THIS
    job on a single shared-memory host. A real N->4N *executor* cluster
    multiplies memory bandwidth 4x along with the cores, so the kernel
    ceiling exists only in the single-host stand-in, not at the deployment
    the north rule targets.

Writes BENCH/GLOVE_SCALING.md + prints one SUMMARY json line.

Usage: python tools/glove_scaling_evidence.py [rounds] [entries]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES = [8, 2]

_KERNEL_WORKER = r"""
import sys, os, time
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
sys.path.insert(0, %r)
import numpy as np
from graph_embeddings_spark.glove.kernel import train_shard, init_params, init_state
# match the REAL shard the probe runs: shards_for targets 250k entries per
# shard and each side's param slice is vocab/grid rows (8M entries, 200k
# vocab, grid 6 -> ~33k rows/side) — the ceiling must carry the same
# working set / DRAM traffic as the task it bounds
n_entries = 250_000; vocab = 33_000; dim = 32
rng = np.random.default_rng(int(sys.argv[1]))
iu = rng.integers(0, vocab, n_entries); jv = rng.integers(0, vocab, n_entries)
x = rng.uniform(1, 5, n_entries)
ids = np.arange(vocab, dtype=np.int64)
focus, context, f_bias, c_bias = init_params(ids, dim, 42)
state = init_state("adagrad", dim, vocab)
kw = dict(method="adagrad", cost="glove", max_x=5.0, iteration=0, batch=4096)
train_shard(iu, jv, x, focus, context, f_bias, c_bias, state, **kw)  # warm
t0 = time.perf_counter(); reps = 6
for r in range(reps):
    train_shard(iu, jv, x, focus, context, f_bias, c_bias, state, **kw)
print((time.perf_counter() - t0) / reps)
""" % (REPO,)


def kernel_ceiling(cores: list[int]) -> dict[int, float]:
    """Aggregate shards/sec from N concurrent REAL-kernel processes."""
    out = {}
    for k in sorted(cores):
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _KERNEL_WORKER, str(i)],
                stdout=subprocess.PIPE, text=True,
            )
            for i in range(k)
        ]
        per = [float(p.communicate()[0]) for p in procs]
        out[k] = round(k / (sum(per) / len(per)), 3)
    return out


def _spin(_):
    s = 0
    for i in range(30_000_000):
        s += i
    return s


def spin_ceiling(cores: list[int]) -> dict[int, float]:
    import multiprocessing as mp
    import time

    spin = _spin
    out = {}
    for n in sorted(cores):
        t0 = time.perf_counter()
        with mp.Pool(n) as p:
            p.map(spin, range(n))
        out[n] = round(n / (time.perf_counter() - t0), 3)
    return out


def run_probe(cores: int, entries: int) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "glove_scale_probe.py"),
         str(cores), str(entries)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    for line in proc.stdout.splitlines():
        idx = line.find("PROBE{")
        if idx >= 0:
            return json.loads(line[idx + 5 :])
    raise RuntimeError(f"probe local[{cores}] produced no PROBE line: {proc.stderr[-1500:]}")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    entries = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    runs: dict[int, list[dict]] = {c: [] for c in CORES}
    for r in range(rounds):
        for c in CORES:
            p = run_probe(c, entries)
            runs[c].append(p)
            print(f"round {r} local[{c}]: trials {p['trials']}", file=sys.stderr, flush=True)

    best = {c: min(p["best"] for p in runs[c]) for c in CORES}
    eff = round(best[2] / best[8] / 4, 3)
    kern = kernel_ceiling(CORES)
    kern_eff = round(kern[8] / (4 * kern[2]), 3)
    spin = spin_ceiling(CORES)
    spin_eff = round(spin[8] / (4 * spin[2]), 3)
    n_shards = runs[CORES[0]][0]["n_shards"]
    summary = {
        "entries": entries,
        "rounds": rounds,
        "n_shards": n_shards,
        "best_epoch_sec": {f"local[{c}]": best[c] for c in CORES},
        "epoch_efficiency_2_to_8": eff,
        "kernel_ceiling_shards_per_sec": {f"{c}_procs": kern[c] for c in CORES},
        "kernel_ceiling_efficiency_2_to_8": kern_eff,
        "spin_ceiling_efficiency_2_to_8": spin_eff,
        "epoch_eff_vs_kernel_ceiling": round(eff / kern_eff, 3),
    }
    print("SUMMARY" + json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "GLOVE_SCALING.md"), "w") as f:
        f.write("# GloVe epoch scaling evidence (N vs 4N cores)\n\n")
        f.write(
            f"One side-split grid-sharded AdaGrad epoch (dim 32, batch 4096,\n"
            f"{n_shards} shards from shards_for) over a deterministic skewed\n"
            f"synthetic co-occurrence of {entries:,} entries /\n"
            f"{max(25_000, entries // 40):,}-node-per-side vocab — ~127x the\n"
            f"r2 bench size, so kernel compute dominates the fixed per-epoch\n"
            f"overhead that made the small size anti-scale.\n"
            f"Fresh child JVM per measurement; within a child, best of\n"
            f"{os.environ.get('GLOVE_PROBE_TRIALS', '3')} back-to-back epochs"
            f" (first pays codegen + worker start);\n"
            f"{rounds} alternating rounds per core count, best kept.\n\n"
        )
        f.write("| config | best epoch s | throughput (entries/s) |\n|---|---|---|\n")
        for c in CORES:
            f.write(f"| local[{c}] | {best[c]} | {round(entries / best[c]):,} |\n")
        f.write(
            f"\n**Epoch scaling efficiency 2 -> 8 cores: {eff}**\n\n"
            "Hardware ceilings measured in the same run:\n\n"
            f"- real-kernel ceiling (N independent processes, each one shard\n"
            f"  kernel, no Spark): {kern[2]} -> {kern[8]} shards/s aggregate, "
            f"efficiency **{kern_eff}**\n"
            f"- raw-CPU spin ceiling: **{spin_eff}**\n"
            f"- epoch efficiency normalized to the kernel ceiling: "
            f"**{summary['epoch_eff_vs_kernel_ceiling']}**\n\n"
            "The epoch's tasks are memory-bound numpy: on this single shared-\n"
            "memory VM, concurrent workers contend for DRAM bandwidth, so even\n"
            "perfectly parallel copies of the raw kernel scale at only\n"
            f"{kern_eff} from 2 to 8 processes. The north rule's N vs 4N\n"
            "criterion targets separate executors whose memory bandwidth\n"
            "scales with the cluster; the kernel ceiling row quantifies\n"
            "exactly how much of the measured loss is the host, not the\n"
            "engine.\n\nAll rounds (best epoch s per child):\n\n"
        )
        for c in CORES:
            f.write(f"- local[{c}]: {[p['best'] for p in runs[c]]}\n")


if __name__ == "__main__":
    main()
