#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol): run
bench.py at N=local[8] and 4N=local[32] on the SAME input, report
urls/sec at both and efficiency = (thr_32 / thr_8) / 4.

Per driver instruction this sandbox proxies the north rule's
"N and 4N executors" criterion with two parallelism levels on one box.
Writes BENCH/BASELINE.md. Usage: python bench/scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, env_extra: dict[str, str]) -> dict:
    env = os.environ.copy()
    env.update(env_extra)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_WORKDIR"] = os.path.join(ROOT, f".bench-{cpus}")
    # Pin the WHOLE process tree (JVM task threads + python UDF
    # workers) to `cpus` cores — otherwise the "N" run's pandas-UDF
    # workers overflow onto the idle cores and the comparison measures
    # 2N-vs-4N, not N-vs-4N. This mirrors a real cluster, where an
    # executor's python workers share the executor's core allocation.
    cmd = [sys.executable, os.path.join(ROOT, "bench.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    env_extra = {
        "BENCH_PAGES": os.environ.get("BENCH_PAGES", "900000"),
        "BENCH_BUDGET": os.environ.get("BENCH_BUDGET", "180000"),
        "BENCH_ROUNDS": os.environ.get("BENCH_ROUNDS", "3"),
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    }
    def _flush_caches() -> None:
        # writeback from the previous run must not stall this one, and
        # both runs should start with the same (cold) page cache.
        os.sync()
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
        except OSError:
            pass

    _flush_caches()
    r8 = run(8, env_extra)
    _flush_caches()
    r32 = run(32, env_extra)
    t8, t32 = r8["urls_per_sec"], r32["urls_per_sec"]
    eff = (t32 / t8) / 4 if t8 else 0.0
    round_rows = []
    for key in sorted(r8["queries"]):
        if key.startswith("round_") and key in r32["queries"]:
            a, b = r8["queries"][key], r32["queries"][key]
            round_rows.append(
                f"| {key} | {a} | {b} | {(a / b) / 4:.3f} |"
            )
    per_round = "\n".join(
        ["| timed round | local[8] sec | local[32] sec | efficiency |",
         "|---|---|---|---|"] + round_rows
    )
    doc = f"""# BENCH/BASELINE — measured scaling (sandbox proxy protocol)

Per `BASELINE.md`: same job, same input, two parallelism levels on one
32-core box (proxy for N and 4N executors — no real cluster in this
sandbox). Input: synthetic Common-Crawl-style pages derived from
`{env_extra['SPARK_GRAFT_SF_DIR']}` documents
({env_extra['BENCH_PAGES']} pages, zipf hosts, ~30 KB html), full
engine rounds (dequeue -> fetch/extract -> sinks -> merge ->
checkpoint), 1 warm-up + {env_extra['BENCH_ROUNDS']} timed rounds of
{env_extra['BENCH_BUDGET']} urls.

| run | master | urls fetched | timed sec | urls/sec |
|---|---|---|---|---|
| N  | local[8]  | {r8["urls_fetched"]} | {r8["value"]} | {t8} |
| 4N | local[32] | {r32["urls_fetched"]} | {r32["value"]} | {t32} |

**scaling efficiency = ({t32} / {t8}) / 4 = {eff:.3f}**
(target >= 0.8 -> {"PASS" if eff >= 0.8 else "FAIL"})

{per_round}

Hardware ceiling on this box (pure-CPU multiprocessing, pinned):
3.36x from 8 to 32 cores = 0.84 efficiency — see BASELINE.md.

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    out_path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(doc)
    print(json.dumps({"urls_per_sec_8": t8, "urls_per_sec_32": t32,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
