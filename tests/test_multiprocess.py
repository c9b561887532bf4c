"""Real 2-process jax.distributed coverage (VERDICT r1 next-step #4):
spawns tools/multiproc_smoke.py, which runs two coordinated CPU processes
through warm-up -> conversion -> sparse steps -> eval -> collective orbax
save and compares process-0 losses against a single-process run."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_training_matches_single_process():
    env = dict(os.environ)
    # the tool manages its own XLA_FLAGS / platform in child processes
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_smoke.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert out.returncode == 0, f"\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    assert "MULTIPROC SMOKE [unrolled] OK" in out.stdout
    assert "MULTIPROC SMOKE [scan] OK" in out.stdout
