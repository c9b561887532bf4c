"""Batch-size sweep of the 8B scan sparse step (bench smt_big stack: int8
base + q_head + host offload + scan + remat) on one v5e chip: larger
batches amortize per-step fixed costs; the limit is the scan carry's saved
per-layer inputs (bs * seq * H bf16 * L) + loss chunks.

Run: python tools/big8b_batch_sweep.py [bsz ...]   (default: 8 12 16)
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run(bsz: int) -> None:
    import subprocess
    out = subprocess.run(
        [sys.executable, "bench.py", "--phase", "smt_big"],
        capture_output=True, text=True, timeout=2400,
        env={**__import__("os").environ, "SMT_BIG_BSZ": str(bsz)})
    for line in out.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            import json
            r = json.loads(line[len("PHASE_RESULT "):])
            print(f"bs={bsz}: {r['sec_per_step']:.4f} s/step  "
                  f"{r['tokens']/r['sec_per_step']:.0f} tok/s  "
                  f"live {r['live_hbm_bytes']/2**30:.2f} GiB  "
                  f"spread {r['timing']['spread']}")
            return
    print(f"bs={bsz}: FAILED\n{out.stdout[-1500:]}\n{out.stderr[-2000:]}")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 12, 16]
    for b in sizes:
        run(b)


if __name__ == "__main__":
    main()
