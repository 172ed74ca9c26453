"""SIGKILL-mid-parse resume demo at sf0.1 (200k battles).

Phase A: run run_flagship in a child process group, SIGKILL it mid-parse.
Phase B: resume in a fresh process; record which shards were skipped.
Phase C: clean run into a separate dir; compare family counts.
"""
import json
import os
import shutil
import signal
import subprocess
import sys
import time

CORPUS = "/tmp/stats_ray_corpus/sf0.1"
OUT = "/tmp/flag_kill"
OUT_CLEAN = "/tmp/flag_clean"

CHILD = r"""
import sys, json
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, "/root/repo")
from stats_ray.pipelines.usage import run_flagship
counts = run_flagship("%(corpus)s", "%(out)s", parse_shards=8)
print("COUNTS " + json.dumps(counts), flush=True)
ray.shutdown()
"""


ERRLOG = "/tmp/kill_resume_child_err.log"


def run_child(out, kill_after=None):
    code = CHILD % {"corpus": CORPUS, "out": out}
    with open(ERRLOG, "a") as ef:
        p = subprocess.Popen([sys.executable, "-c", code],
                             stdout=subprocess.PIPE, stderr=ef,
                             text=True, start_new_session=True,
                             cwd="/root/repo")
        if kill_after is None:
            out_text, _ = p.communicate(timeout=560)
            return p.returncode, out_text
        time.sleep(kill_after)
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    return p.returncode, ""


def counts_of(rc, text, phase):
    if rc != 0 or "COUNTS " not in text:
        tail = open(ERRLOG).read()[-2000:] if os.path.exists(ERRLOG) else ""
        print(json.dumps({"phase": phase, "rc": rc, "error": True,
                          "stderr_tail": tail}))
        sys.exit(1)
    return json.loads(text.split("COUNTS ", 1)[1])


def manifest_entries(out):
    es = []
    mp = os.path.join(out, "manifest.jsonl")
    if os.path.exists(mp):
        for line in open(mp):
            line = line.strip()
            if line:
                es.append(json.loads(line))
    return es


def main():
    for d in (OUT, OUT_CLEAN):
        shutil.rmtree(d, ignore_errors=True)

    t0 = time.time()
    os.makedirs(OUT, exist_ok=True)
    rc, _ = run_child(OUT, kill_after=18.0)  # mid-parse: a few shards done
    done_after_kill = [e["key"] for e in manifest_entries(OUT)
                       if not e.get("invalidated")]
    tmp_orphans = []
    for dirpath, dirnames, _f in os.walk(OUT):
        tmp_orphans += [d for d in dirnames if ".tmp-" in d]
    print(json.dumps({
        "phase": "A-killed", "rc": rc, "wall": round(time.time() - t0, 1),
        "shards_done_at_kill": sorted(done_after_kill),
        "tmp_orphans": tmp_orphans}))

    mtimes = {k: os.path.getmtime(os.path.join(OUT, k))
              for k in done_after_kill if os.path.isdir(os.path.join(OUT, k))}

    t1 = time.time()
    rc2, text = run_child(OUT)
    resumed = counts_of(rc2, text, "B-resumed")
    entries2 = manifest_entries(OUT)
    redone = [e["key"] for e in entries2
              if not e.get("invalidated")
              and e["key"].startswith("parsed-")
              and e["key"] not in done_after_kill]
    untouched = all(
        os.path.getmtime(os.path.join(OUT, k)) == v
        for k, v in mtimes.items())
    print(json.dumps({
        "phase": "B-resumed", "rc": rc2,
        "wall": round(time.time() - t1, 1),
        "shards_recomputed": sorted(redone),
        "prekill_shards_untouched": untouched,
        "counts": resumed}))

    t2 = time.time()
    rc3, text = run_child(OUT_CLEAN)
    clean = counts_of(rc3, text, "C-clean")
    print(json.dumps({
        "phase": "C-clean", "rc": rc3, "wall": round(time.time() - t2, 1),
        "counts_equal": clean == resumed}))


if __name__ == "__main__":
    main()
