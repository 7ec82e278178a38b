"""Suite runner: one pytest subprocess per test file.

The monolithic `pytest tests/` run accumulates jax+torch native state over
~40 min in one process and can flakily segfault inside XLA's CPU
backend_compile (rc 139) — not a test failure. Running each file in a fresh
interpreter is the documented way to run the whole suite:

    python run_tests.py             # whole suite
    python run_tests.py -m "not parity"   # quick subset
    python run_tests.py tests/test_stft.py tests/test_nn.py  # chosen files
    python run_tests.py -j 4        # 4 files in parallel

Exit code is non-zero if any file fails. A file that dies with a signal
(segfault) is retried once in a fresh process before being reported.
"""
import argparse
import glob
import os
import subprocess
import sys
import time

# Files that themselves spawn subprocesses with wall-clock timeouts
# (train.py smoke runs, multi-process launches, export roundtrips). Under
# `-j N` the box is N-way loaded and those inner timeouts blow up flakily —
# so the parallel phase excludes them and they run serially afterwards,
# with the machine to themselves (VERDICT r2 Weak #6).
SERIAL_FILES = {
    "tests/test_data_and_training.py",
    "tests/test_shard_pipeline.py",
    "tests/test_serving.py",
    "tests/test_multihost.py",
}


def run_file(path: str, extra: list, retries: int = 1) -> tuple:
    cmd = [sys.executable, "-m", "pytest", path, "-q", *extra]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    t0 = time.time()
    for attempt in range(retries + 1):
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if proc.returncode >= 0 or attempt == retries:
            break
        print(f"  {path}: died with signal {-proc.returncode}, "
              f"retrying in a fresh process", flush=True)
    return path, proc.returncode, time.time() - t0, proc.stdout, proc.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/)")
    ap.add_argument("-m", dest="mark", default=None,
                    help="pytest -m expression, e.g. 'not parity'")
    ap.add_argument("-j", dest="jobs", type=int, default=1,
                    help="files to run in parallel (default 1: the suite "
                    "holds compile-heavy jax tests; >1 trades isolation "
                    "robustness for wall time)")
    ap.add_argument("-x", dest="failfast", action="store_true")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob("tests/test_*.py"))
    extra = ["-m", args.mark] if args.mark else []

    failed = []
    t0 = time.time()
    if args.jobs > 1:
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
        from concurrent.futures import wait as fwait

        par_files = [f for f in files if f not in SERIAL_FILES]
        ser_files = [f for f in files if f in SERIAL_FILES]
        with ThreadPoolExecutor(args.jobs) as ex:
            pending = {ex.submit(run_file, f, extra) for f in par_files}
            results = []
            while pending:
                done, pending = fwait(pending, return_when=FIRST_COMPLETED)
                for fut in done:
                    results.append(fut.result())
                # honor -x in parallel mode too: stop scheduling new files
                # once any file has failed (in-flight files still finish)
                if args.failfast and any(r[1] != 0 for r in results):
                    still_running = [f for f in pending if not f.cancel()]
                    results.extend(f.result() for f in still_running)
                    pending = set()
        # subprocess-heavy files: serial, after the parallel phase
        if not (args.failfast and any(r[1] != 0 for r in results)):
            for f in ser_files:
                results.append(run_file(f, extra))
                if args.failfast and results[-1][1] != 0:
                    break
    else:
        results = []
        for f in files:
            res = run_file(f, extra)
            results.append(res)
            _report(res, failed)
            if failed and args.failfast:
                break
        n_run = len(results)
        results = None  # already reported

    if results is not None:
        for res in results:
            _report(res, failed)
        n_run = len(results)

    n = len(files)
    if n_run < n:   # failfast cut the run short (serial or parallel)
        print(f"\n{n_run - len(failed)}/{n_run} run files green "
              f"({n - n_run} skipped by -x) in {time.time() - t0:.0f}s")
    else:
        print(f"\n{n - len(failed)}/{n} files green "
              f"in {time.time() - t0:.0f}s")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


def _report(res, failed):
    path, rc, dt, out, err = res
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    status = "ok" if rc == 0 else f"FAIL rc={rc}"
    print(f"[{status:>10}] {path} ({dt:.0f}s) {tail}", flush=True)
    if rc != 0:
        failed.append(path)
        sys.stdout.write(out[-4000:] + "\n" + err[-2000:] + "\n")


if __name__ == "__main__":
    main()
