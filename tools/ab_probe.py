"""Alternating A/B harness over glove_scale_probe child JVMs.

Co-tenant noise on this host swings epoch times 2x minute-to-minute, so
single runs can't rank configs. This alternates the candidate configs
round-robin (each round exposes every config to roughly the same noise
window) and reports per-round times plus the per-config best.

Usage:
    python tools/ab_probe.py <rounds> <entries> <spec> [<spec> ...]
    spec = label:cores[:n_shards[:json-conf]]
e.g.
    python tools/ab_probe.py 3 8000000 base:8 fat16:8:16 \
      'nocomp:8:16:{"spark.shuffle.compress":"false"}'
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_probe(cores: int, entries: int, n_shards: int | None, conf: dict) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, GLOVE_PROBE_CONF=json.dumps(conf))
    argv = [sys.executable, os.path.join(REPO, "tools", "glove_scale_probe.py"),
            str(cores), str(entries)]
    if n_shards is not None:
        argv.append(str(n_shards))
    proc = subprocess.run(argv, env=env, capture_output=True, text=True, timeout=900)
    for line in proc.stdout.splitlines():
        idx = line.find("PROBE{")
        if idx >= 0:
            return json.loads(line[idx + 5 :])
    raise RuntimeError(f"no PROBE line: {proc.stderr[-1200:]}")


def main():
    rounds = int(sys.argv[1])
    entries = int(sys.argv[2])
    specs = []
    for raw in sys.argv[3:]:
        parts = raw.split(":", 3)
        label, cores = parts[0], int(parts[1])
        n_shards = int(parts[2]) if len(parts) > 2 and parts[2] else None
        conf = json.loads(parts[3]) if len(parts) > 3 else {}
        specs.append((label, cores, n_shards, conf))

    results: dict[str, list[float]] = {s[0]: [] for s in specs}
    for r in range(rounds):
        for label, cores, n_shards, conf in specs:
            p = run_probe(cores, entries, n_shards, conf)
            results[label].append(p["best"])
            print(f"round {r} {label}: best {p['best']}s trials {p['trials']} "
                  f"(n_shards={p['n_shards']})", flush=True)
    print("AB" + json.dumps({l: {"best": min(v), "all": v} for l, v in results.items()}))


if __name__ == "__main__":
    main()
