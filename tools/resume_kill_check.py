"""Checkpoint-resume crash test at scale (north rule: resumable from
checkpoint). Protocol:

1. launch run_dedupe.py as a subprocess on INPUT with a fresh ckpt dir;
2. wait until the signatures stage commits and the pairs stage is
   underway (its scratch dir appears), then SIGKILL the process —
   a mid-shuffle hard crash;
3. rerun to completion with resume (the default): signatures must be
   skipped, pairs recomputed;
4. run an independent clean pipeline into a second ckpt dir and assert
   the canonical outputs are IDENTICAL row-for-row (url, component
   membership partition, is_canonical).

Usage: python tools/resume_kill_check.py INPUT [CKPT_ROOT]
Prints one JSON line with the kill point, walls, and the equality check.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _canonical_summary(spark, ckpt: str):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{ckpt}/canonical")
    # component labels are min-nid values — stable across runs of the
    # same config, so compare (url, is_canonical) plus an
    # order-insensitive hash of the full (url, component, canonical) set
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_canonical").cast("long")).alias("kept"),
        F.bit_xor(
            F.xxhash64("url", F.col("component_id").cast("string"), "is_canonical")
        ).alias("content_hash"),
    ).collect()[0]
    return {"n": row["n"], "kept": row["kept"], "content_hash": row["content_hash"]}


def main() -> int:
    inp = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/resume_kill"
    shutil.rmtree(root, ignore_errors=True)
    ckpt_a, ckpt_b = f"{root}/crashed", f"{root}/clean"

    def launch(ckpt):
        return subprocess.Popen(
            [sys.executable, "run_dedupe.py", "--input", inp, "--ckpt", ckpt],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            env=os.environ,
        )

    # phase 1: run, kill during pairs
    proc = launch(ckpt_a)
    kill_point = None
    t0 = time.time()
    while proc.poll() is None and time.time() - t0 < 3600:
        sig_done = os.path.exists(f"{ckpt_a}/signatures/_SUCCESS")
        # pairs is underway once signatures is committed AND audited
        # (the audit marker is the last signatures-stage artifact; the
        # run proceeds straight into the pairs builder after it). The
        # old probe watched for the _scratch dir, which small corpora
        # no longer create (scratch_local_max_docs localCheckpoints
        # intra-stage intermediates instead of spilling parquet).
        pairs_started = sig_done and os.path.exists(
            f"{ckpt_a}/signatures/_AUDITED"
        )
        pairs_done = os.path.exists(f"{ckpt_a}/pairs/_SUCCESS")
        if sig_done and pairs_started and not pairs_done:
            # settle ~3s so the kill lands well inside the pairs
            # shuffles, but poll while settling: on small inputs the
            # pairs stage can commit during a fixed sleep, which would
            # turn the mid-pairs kill into a flaky assert. If it does
            # commit first, kill immediately wherever the run is —
            # still a hard mid-run crash, labeled honestly.
            settle_until = time.time() + 3
            while (
                time.time() < settle_until
                and not os.path.exists(f"{ckpt_a}/pairs/_SUCCESS")
                and proc.poll() is None
            ):
                time.sleep(0.1)
            if proc.poll() is not None:
                break  # run finished before we could kill — retry below
            proc.send_signal(signal.SIGKILL)
            kill_point = (
                "mid-pairs"
                if not os.path.exists(f"{ckpt_a}/pairs/_SUCCESS")
                else "post-pairs"
            )
            break
        time.sleep(0.5)
    proc.wait()
    assert kill_point is not None, "never observed the pairs stage running"
    if kill_point == "mid-pairs":
        assert not os.path.exists(f"{ckpt_a}/pairs/_SUCCESS")

    # phase 2: resume to completion
    t1 = time.time()
    rc = launch(ckpt_a).wait()
    resume_wall = time.time() - t1
    assert rc == 0, "resumed run failed"

    # phase 3: independent clean run
    t2 = time.time()
    rc = launch(ckpt_b).wait()
    clean_wall = time.time() - t2
    assert rc == 0, "clean run failed"

    from dedupe_trees_spark.session import get_spark

    spark = get_spark("resume_check")
    a, b = _canonical_summary(spark, ckpt_a), _canonical_summary(spark, ckpt_b)
    print(
        json.dumps(
            {
                "input": inp,
                "kill_point": kill_point,
                "resume_wall_sec": round(resume_wall, 1),
                "clean_wall_sec": round(clean_wall, 1),
                "crashed_then_resumed": a,
                "clean": b,
                "identical": a == b,
            }
        )
    )
    assert a == b, "resumed output differs from clean run"
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
