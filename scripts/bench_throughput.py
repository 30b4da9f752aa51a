"""Throughput asymptote: the full contract suite at local[32] on a LARGE
input (default 480k convs ≈ 33.6M turns), where per-job fixed costs are
amortized — the number that projects to cluster-scale per-core throughput.

Complements scripts/bench_scaling.py (which measures the N→4N efficiency
pair on a mid-size input). Writes its result to BENCH_SCALING.json under
``asymptote`` (BENCH.md's table is maintained by hand from it).

Usage: python scripts/bench_throughput.py [n_convs]
  env DCE_HUGE_DATA=<parquet dir> reuses generated input
  (default cache path /tmp/dce_scale_huge).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from data_contract_engine_spark import build_session, ContractEngine, parse_contract_yaml
from data_contract_engine_spark.fixtures.transcripts import FLAGSHIP_CONTRACT_YAML
from data_contract_engine_spark.operators.drift import baseline_snapshot

data_path = sys.argv[1]
spark = build_session(app_name="asymptote", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={{"spark.sql.files.maxPartitionBytes":
                                   str(16 * 1024 * 1024)}})
tr = spark.read.parquet(data_path)
contract = parse_contract_yaml(FLAGSHIP_CONTRACT_YAML, name="flagship")
snap = baseline_snapshot(
    tr, {{c: s.get("expr") or c for c, s in contract.quality.drift.items()}})
eng = ContractEngine(spark, drift_baseline_snapshot=snap)
eng.validate(tr.limit(2000), contract, key_columns=["conv_id","turn_idx"]).report()
# min of 3 trials — same steady-state methodology as bench_scaling.py
wall = None
for _ in range(3):
    t0 = time.time()
    rep = ContractEngine(spark, drift_baseline_snapshot=snap).validate(
        tr, contract, key_columns=["conv_id", "turn_idx"]).report()
    w = time.time() - t0
    wall = w if wall is None else min(wall, w)
print(json.dumps({{"wall_sec": round(wall, 3), "turns": rep.total_records,
                  "turns_per_sec": round(rep.total_records / wall, 1),
                  "violations": rep.total_violation_rows}}))
spark.stop()
"""


def main():
    n_convs = (
        int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else 480000
    )
    data_path = os.environ.get("DCE_HUGE_DATA", "/tmp/dce_scale_huge")
    if not os.path.exists(os.path.join(data_path, "_SUCCESS")):
        print(f"generating {n_convs} convs at {data_path} ...", flush=True)
        gen = f"""
import sys; sys.path.insert(0, {REPO!r})
from data_contract_engine_spark import build_session
from data_contract_engine_spark.fixtures.transcripts import transcripts_df
spark = build_session(app_name="gen", master="local[32]", shuffle_partitions=64)
transcripts_df(spark, n_convs={n_convs}, seed=42).repartition(128)\\
    .write.mode("overwrite").parquet({data_path!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", gen], check=True)
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO), data_path],
        check=True, capture_output=True, text=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    print(line, flush=True)

    art_path = os.path.join(REPO, "BENCH_SCALING.json")
    try:
        with open(art_path) as f:
            artifact = json.load(f)
    except OSError:
        artifact = {}
    artifact["asymptote"] = {
        "parallelism": "local[32]",
        **result,
        "source": "scripts/bench_throughput.py",
    }
    with open(art_path, "w") as f:
        json.dump(artifact, f, indent=1)

    # BENCH_SCALING.json is the single source of truth (bench.py embeds
    # it); BENCH.md's asymptote table is maintained by hand from it —
    # appending here duplicated the number on every rerun.


if __name__ == "__main__":
    main()
