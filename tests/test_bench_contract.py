"""The driver contract: `python bench.py` prints ONE JSON line with
metric/value/unit/vs_baseline. Validated via the CPU --small path."""
import json
import subprocess
import sys


def test_bench_small_prints_one_json_line():
    out = subprocess.run(
        [sys.executable, "bench.py", "--small"],
        capture_output=True, text=True, timeout=900, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    rec = json.loads(json_lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    assert rec["detail"]["opt_state_ratio"] < 0.2
