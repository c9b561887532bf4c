"""Batch/seq sweep of the 8B scan sparse step (bench smt_big stack: int8
base + q_head + host offload + scan + remat) on one v5e chip: larger
batches amortize per-step fixed costs; the limit is the scan carry's saved
per-layer inputs (bs * seq * H bf16 * L) + loss chunks.

Measured (v5e, 2026-08-18): bs8/s1024 5431 tok/s (bench default),
bs12/s1024 5269 tok/s (compute-saturated — bigger batch does not pay),
bs16/s1024 OOM.

Run: python tools/big8b_batch_sweep.py [bsz[xseq] ...]  (default: 8 12 16)
e.g. `python tools/big8b_batch_sweep.py 4x2048` = reference recipe length.
"""
import subprocess
import sys

sys.path.insert(0, ".")


def run(bsz: int, seq: int) -> None:
    import os
    out = subprocess.run(
        [sys.executable, "bench.py", "--phase", "smt_big"],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, "SMT_BIG_BSZ": str(bsz),
             "SMT_BIG_SEQ": str(seq)})
    for line in out.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            import json
            r = json.loads(line[len("PHASE_RESULT "):])
            print(f"bs={bsz} seq={seq}: {r['sec_per_step']:.4f} s/step  "
                  f"{r['tokens']/r['sec_per_step']:.0f} tok/s  "
                  f"live {r['live_hbm_bytes']/2**30:.2f} GiB  "
                  f"spread {r['timing']['spread']}", flush=True)
            return
    print(f"bs={bsz} seq={seq}: FAILED\n{out.stdout[-1500:]}\n"
          f"{out.stderr[-2000:]}", flush=True)


def main():
    specs = sys.argv[1:] or ["8", "12", "16"]
    for s in specs:
        b, _, q = s.partition("x")
        run(int(b), int(q) if q else 1024)


if __name__ == "__main__":
    main()
