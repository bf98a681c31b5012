"""Scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the identical extraction job on the
identical input at local[4] and local[16] and reporting throughput at
both plus efficiency = (tps_4N / tps_N) / 4.

Why 2/8 and not 8/32: a local[N] Spark with an Arrow-batched Python
kernel keeps ~2N threads busy (N JVM task threads doing Arrow
encode/decode + N Python workers). On this 32-core host, N=16 already
means 32 busy threads = full saturation; local[32] measures host
oversubscription, not the job's scaling (measured: local[16] and
local[32] give identical throughput, and the 4->16 pair degrades
per-slot cost from 74 to 128 ms/turn purely from saturation). The
2->8 pair keeps both levels unsaturated, which is the faithful
substitute for adding executors on a real cluster where each core is
provisioned dedicated.

Each parallelism level runs in a fresh JVM (subprocess) so no warm
state leaks between levels; within each level the measured pass runs
after a full warm-up pass (steady state per BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               # enough turns that the measured pass runs >= ~20s at
               # the high level: after the r2 kernel speedup (7x),
               # 3072 turns finished in ~5s and fixed stage overhead
               # (scheduling, noop-commit) dominated the ratio
               SPARK_GRAFT_BENCH_TURNS="16384",
               # scaling runs measure extraction only; the operator
               # suite is benched separately by the driver's bench.py
               SPARK_GRAFT_BENCH_QUERIES="0",
               SPARK_GRAFT_BENCH_NEWPATH="0",
               # 16,384 turns IS the steady-sized workload here; the
               # bench's own 10x steady add-on would decuple it again
               SPARK_GRAFT_BENCH_STEADY="0")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 2, 8
    # The sandbox host's available CPU drifts over minutes (co-tenant
    # steal; single-level throughput varies ~30% between windows), so
    # a slow window during either level fabricates an efficiency loss
    # that has nothing to do with the job. Run the two levels
    # back-to-back as a ROUND (tight pairing), repeat, and report the
    # median round's efficiency; all rounds are published below.
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    rounds = []
    for _ in range(runs):
        r_lo_i = run_level(lo, sf_dir)
        r_hi_i = run_level(hi, sf_dir)
        eff_i = (r_hi_i["extract_turns_per_sec"]
                 / r_lo_i["extract_turns_per_sec"]) / (hi / lo)
        rounds.append((eff_i, r_lo_i, r_hi_i))
    rounds.sort(key=lambda t: t[0])
    eff, r_lo, r_hi = rounds[len(rounds) // 2]
    tps_lo = r_lo["extract_turns_per_sec"]
    tps_hi = r_hi["extract_turns_per_sec"]
    all_rounds = [{"efficiency": round(e, 3),
                   "tps_lo": rl["extract_turns_per_sec"],
                   "tps_hi": rh["extract_turns_per_sec"]}
                  for e, rl, rh in rounds]

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    now = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH/BASELINE — scaling + throughput evidence

Generated {now} by tools/scaling_bench.py.

## Scaling criterion (north_rule: efficiency >= 0.8 from N to 4N)

Sandbox substitute (no real cluster): the identical extraction job
(deterministic synthetic transcripts incl. golden fixtures,
{r_lo['extract_turns']} turns, fixed seed) on identical input at two
parallelism levels, fresh JVM each.

| level | master | extracted turns/sec | wall (s) |
|---|---|---|---|
| N | local[{lo}] | {tps_lo} | {r_lo['queries']['extract_pipeline']} |
| 4N | local[{hi}] | {tps_hi} | {r_hi['queries']['extract_pipeline']} |

**Scaling efficiency = (tps_4N / tps_N) / 4 = {eff:.3f}**
(median round of {len(rounds)}; target >= 0.8; match-rate vs ground
truth = 1.0, enforced by
tests/test_pipeline.py::test_match_rate_is_one and the lineage
metrics)

All rounds (levels run back-to-back per round; host CPU availability
drifts between windows):

```json
{json.dumps(all_rounds)}
```

## Operator suite at {r_hi['sf']} (local[{hi}])

| query | seconds |
|---|---|
""" + "\n".join(
        f"| {k} | {v} |" for k, v in sorted(r_hi["queries"].items())) + f"""

Suite total: {r_hi['value']} s.

Raw JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    # preserve hand-curated sections appended after the generated part
    # (e.g. the full operator-suite run recorded from bench.py)
    out_path = bench_dir / "BASELINE.md"
    extra = ""
    if out_path.exists():
        old = out_path.read_text()
        marker = "\n## Full operator suite"
        if marker in old:
            extra = "\n" + old[old.index(marker):].lstrip("\n")
    out_path.write_text(md + extra)
    print(json.dumps({"tps_lo": tps_lo, "tps_hi": tps_hi,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
