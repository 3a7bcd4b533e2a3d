#!/usr/bin/env python3
"""Populate the CPU persistent compilation cache (.jax_cache_cpu) by
running each test module in a FRESH pytest process with cache writes
enabled (MSLAM_CACHE_WRITES=1).

Why per-module fresh processes: JAX's cache write path has been seen to
SIGSEGV only after hundreds of executables accumulate in one process;
short single-module runs stay far below that.  Under the normal
`python -m pytest tests/` run, writes are disabled (tests/conftest.py)
and the suite only READS this cache — so a populated cache turns every
module-level recompile into a fast load.

Usage: python tools/warm_test_cache.py [module-substring ...]
"""
import glob
import os
import subprocess
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
mods = sorted(glob.glob(os.path.join(repo, "tests", "test_*.py")))
filters = sys.argv[1:]
if filters:
    mods = [m for m in mods if any(f in os.path.basename(m) for f in filters)]

env = dict(os.environ)
env["MSLAM_CACHE_WRITES"] = "1"
fails = []
for m in mods:
    name = os.path.basename(m)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", m, "-q", "--no-header", "-p",
         "no:cacheprovider"],
        cwd=repo, env=env, capture_output=True, text=True,
    )
    dt = time.time() - t0
    tail = (p.stdout or "").strip().splitlines()
    status = tail[-1] if tail else f"exit={p.returncode}"
    print(f"{name:32s} {dt:7.1f}s  {status}", flush=True)
    if p.returncode != 0:
        fails.append((name, p.returncode))
if fails:
    print("FAILED:", fails)
    sys.exit(1)
