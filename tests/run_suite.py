"""Cold-host suite entry: run the test suite in bounded process chunks.

XLA:CPU in the pinned jax (0.9.0) can SEGFAULT on a plain compile late
in a long many-program process (reproducibly around the ~130th test of
a cold single-process full-suite run, inside backend_compile_and_load;
the crash-site tests pass standalone, so it is accumulated-state, not a
test bug). Persistent-cache WRITES were already made opt-in for the
same reason (see conftest.py) — this runner removes the remaining
exposure by splitting the suite across fresh pytest processes, keeping
each process's distinct-program count far below the crash threshold.

Usage (the suite gate for cold hosts; warm hosts with a populated
tests/.jax_cache can still use plain ``pytest tests/ -q``):

    PYTHONPATH=/root/.axon_site:/root/repo python tests/run_suite.py

Flags are forwarded to every pytest invocation, e.g.::

    python tests/run_suite.py -x -q --chunk-size 6

Exit code is 0 iff every chunk passed.
"""

import argparse
import glob
import os
import subprocess
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunk-size", type=int, default=8,
                    help="test FILES per pytest process (default 8: "
                    "~20 tests/process, well under the ~130-test "
                    "crash threshold)")
    ap.add_argument("--cache-write", action="store_true",
                    help="set LVIO_TEST_CACHE_WRITE=1 so each fresh "
                    "process also populates tests/.jax_cache (safe "
                    "per-process; see conftest.py)")
    args, pytest_args = ap.parse_known_args(argv)

    here = os.path.dirname(os.path.abspath(__file__))
    # positional selections: plain files OR pytest node-ids
    # (tests/test_x.py::test_y). The FILE part decides which chunk runs;
    # the node-id is passed only with its own file so the selected test
    # runs exactly once. A .py-looking arg that matches no file is an
    # error (silently running the whole suite instead was a trap).
    selections = []  # (file, original arg)
    fwd = []
    for a in pytest_args:
        fpart = a.split("::", 1)[0]
        if fpart.endswith(".py"):
            cand = fpart if os.path.exists(fpart) else os.path.join(
                here, os.path.basename(fpart))
            if not os.path.exists(cand):
                print(f"[run_suite] no such test file: {a}",
                      file=sys.stderr)
                return 2
            selections.append((cand, cand + a[len(fpart):]))
        else:
            fwd.append(a)
    pytest_args = fwd
    files = sorted(arg for _, arg in selections)
    if not files:
        files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    chunks = [files[i:i + args.chunk_size]
              for i in range(0, len(files), args.chunk_size)]

    env = dict(os.environ)
    env["LVIO_SUITE_CHUNK"] = "1"  # each child is a bounded chunk; the
    # conftest full-suite guard must not fire on large --chunk-size runs
    if args.cache_write:
        env["LVIO_TEST_CACHE_WRITE"] = "1"

    t0 = time.time()
    failed = []
    for i, chunk in enumerate(chunks):
        names = [os.path.basename(f) for f in chunk]
        print(f"[run_suite] chunk {i + 1}/{len(chunks)}: "
              f"{names[0]} .. {names[-1]}", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *pytest_args, *chunk],
            env=env)
        if r.returncode != 0:
            failed.append((i, names, r.returncode))
    dt = time.time() - t0
    if failed:
        print(f"[run_suite] FAILED chunks after {dt:.0f}s:",
              file=sys.stderr)
        for i, names, rc in failed:
            print(f"  chunk {i + 1} (rc={rc}): {' '.join(names)}",
                  file=sys.stderr)
        return 1
    print(f"[run_suite] all {len(chunks)} chunks green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
