#!/usr/bin/env python
"""Persistent TPU job runner for interactive perf work.

Device-session acquisition over the axon tunnel can take minutes and is
paid PER PROCESS; this worker acquires the chip once and then executes
job files so consecutive experiments cost zero acquisitions.

    python scripts/tpu_worker.py [jobdir=/tmp/tpu_jobs]

Protocol: drop `NNN_name.py` into the jobdir; the worker execs files in
sorted order in ONE SHARED NAMESPACE (so a later job can reuse arrays or
compiled functions from an earlier one), writes stdout + traceback to
`<job>.out`, and `OK`/`ERR` to `<job>.done`.  Poll the .done file.
"""

import contextlib
import glob
import io
import os
import sys
import time
import traceback


def main():
    jobdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    os.makedirs(jobdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    t0 = time.time()
    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    _ = float(jax.device_put(jax.numpy.zeros(1))[0])
    print(f"worker ready on {jax.devices()} "
          f"(acquire {time.time()-t0:.1f}s)", flush=True)

    while True:
        for job in sorted(glob.glob(os.path.join(jobdir, "*.py"))):
            done = job + ".done"
            if os.path.exists(done):
                continue
            print(f"run {job}", flush=True)
            # fresh namespace per job: the old shared-namespace design let
            # device buffers from earlier jobs (TrainStates, camera blocks)
            # accumulate and shrink the budget of later ones
            ns = {"jax": jax}
            # drop cached repo modules so a job always sees the working
            # tree's CURRENT code: this worker lives for hours, and a
            # stale s3gaussian_tpu module imported by an earlier job
            # silently shadows commits landed since (jit caches are
            # per-function objects, so nothing leaks; recompiles hit the
            # persistent compilation cache)
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            for name in [m for m, mod in list(sys.modules.items())
                         if getattr(mod, "__file__", None)
                         and os.path.abspath(mod.__file__).startswith(
                             repo + os.sep)]:
                del sys.modules[name]
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    code = open(job).read()
                    exec(compile(code, job, "exec"), ns)
                status = "OK"
            except BaseException:
                buf.write(traceback.format_exc())
                status = "ERR"
            out_text = buf.getvalue()
            with open(job + ".out", "w") as f:
                f.write(out_text)
            with open(done, "w") as f:
                f.write(status)
            print(f"  -> {status}", flush=True)
            if "RESOURCE_EXHAUSTED" in out_text:
                # a device OOM poisons the runtime: every later dispatch in
                # this process fails. Re-exec for a clean session (pays one
                # device re-acquisition) and continue the queue.
                print("OOM detected - restarting worker process", flush=True)
                os.execv(sys.executable,
                         [sys.executable, os.path.abspath(__file__), jobdir])
        time.sleep(0.5)


if __name__ == "__main__":
    main()
