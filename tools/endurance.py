"""Endurance + kill-resume demonstration at N× the sf0.1 corpus.

    python tools/endurance.py [factor] [n_parts]   # default 256, 32

Three phases, one JSON line each:

1. STREAM  — one streaming execution of the flagship over the N×
   corpus (the scaling-harness workload at 4× its size): triples/sec
   and the triple count that phases 2-3 must reproduce.
2. KILL    — the resumable build (run_resumable: one atomic parquet
   partition + manifest per conv_id hash bucket) started in a child
   process and SIGKILLed mid-run; reports how many partitions its
   manifests recorded as durable.
3. RESUME  — the same command re-run to completion; reports how many
   partitions were skipped (the killed run's durable work) and asserts
   the merged output's triple count equals phase 1's streaming count —
   crash + resume is bit-equivalent to the one-shot build.
"""
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_PARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SF_DIR = "/root/testdata/sf0.1"
OUT = f"/tmp/kire_ray_endurance_x{FACTOR}"

CHILD = f"""
import sys, time
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, log_to_driver=False)
from kire_ray.pipelines.kg_construct import run_resumable
run_resumable("{{corpus}}", "{OUT}", n_parts={N_PARTS}, chunk_size=4)
print("CHILD_DONE", flush=True)
"""


def main() -> None:
    import bench

    corpus = bench._scaling_corpus(SF_DIR, factor=FACTOR)

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, log_to_driver=False)
    from kire_ray.pipelines.kg_construct import (
        KGContext,
        extract_triples,
        linked_documents,
        read_transcripts,
    )

    ctx = KGContext.from_corpus(corpus)
    extract_triples(
        linked_documents(read_transcripts(corpus).limit(5000), ctx), ctx
    ).count()
    t0 = time.time()
    n_stream = extract_triples(
        linked_documents(read_transcripts(corpus), ctx), ctx
    ).count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "phase": "stream",
                "factor": FACTOR,
                "n_triples": n_stream,
                "sec": round(dt, 1),
                "triples_per_sec": round(n_stream / dt, 1),
            }
        ),
        flush=True,
    )
    ray.shutdown()

    # phase 2: start the resumable build, SIGKILL it mid-run
    import shutil

    shutil.rmtree(OUT, ignore_errors=True)
    child = subprocess.Popen(
        [sys.executable, "-c", CHILD.format(corpus=corpus)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    # give it time to durably finish SOME but not ALL partitions
    kill_after = float(os.environ.get("ENDURANCE_KILL_AFTER", "90"))
    time.sleep(kill_after)
    child.send_signal(signal.SIGKILL)
    child.wait()
    from kire_ray.state.manifest import done_partitions

    done_at_kill = sorted(done_partitions(OUT, N_PARTS))
    print(
        json.dumps(
            {
                "phase": "kill",
                "killed_after_sec": kill_after,
                "durable_partitions": len(done_at_kill),
                "n_parts": N_PARTS,
            }
        ),
        flush=True,
    )
    if not (0 < len(done_at_kill) < N_PARTS):
        raise SystemExit(
            f"kill timing missed the window ({len(done_at_kill)}/{N_PARTS} done) "
            "- adjust ENDURANCE_KILL_AFTER"
        )

    # phase 3: resume to completion, verify count identity
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-c", CHILD.format(corpus=corpus)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    resume_sec = time.time() - t0
    if p.returncode != 0 or "CHILD_DONE" not in p.stdout:
        raise SystemExit(f"resume run failed: {p.stderr[-2000:]}")

    ray.init(address="local", num_cpus=32, include_dashboard=False, log_to_driver=False)
    from kire_ray.pipelines.kg_construct import load_output

    n_resumed = load_output(OUT, "triples").count()
    ray.shutdown()
    print(
        json.dumps(
            {
                "phase": "resume",
                "skipped_partitions": len(done_at_kill),
                "resume_sec": round(resume_sec, 1),
                "n_triples": n_resumed,
                "matches_stream": n_resumed == n_stream,
            }
        ),
        flush=True,
    )
    if n_resumed != n_stream:
        raise SystemExit("TRIPLE COUNT MISMATCH: resumable != streaming")


if __name__ == "__main__":
    main()
