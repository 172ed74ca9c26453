"""Resumable job checkpointing (S4: logs/src/storage.ts:97-160 analogue).

Filesystem-as-database of completed work units: every pipeline stage that
writes a Parquet partition records a manifest entry with lineage (inputs,
code version, config) and metrics (rows, wall seconds). On restart, done
partitions are skipped; writes go to a temp dir and are renamed into place
so a crash mid-write never leaves a partition marked complete.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid


class Manifest:
    """JSON-lines manifest of completed partitions at <root>/manifest.jsonl."""

    def __init__(self, root: str, lineage: dict | None = None,
                 match_any_lineage: bool = False):
        self.root = root
        self.path = os.path.join(root, "manifest.jsonl")
        self.lineage = lineage or {}
        # serializes manifest appends: run() may be called from several
        # driver threads at once (distinct keys), e.g. concurrent
        # aggregate families in run_flagship
        self._wlock = threading.Lock()
        os.makedirs(root, exist_ok=True)
        self._done: dict[str, dict] = {}
        if os.path.exists(self.path):
            # Last entry per key wins REGARDLESS of lineage: a later run
            # with a different lineage overwrote the partition dir on disk,
            # so an older matching-lineage entry for the same key is stale —
            # resuming from it would serve the other run's data (A→B→A).
            last: dict[str, dict] = {}
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn write of the final line
                    last[e["key"]] = e
            self._done = {k: e for k, e in last.items()
                          if not e.get("invalidated")
                          and (match_any_lineage
                               or e.get("lineage") == self.lineage)}

    def done(self, key: str) -> bool:
        return key in self._done

    def entries(self) -> dict[str, dict]:
        return dict(self._done)

    def mark(self, key: str, **metrics) -> None:
        e = {"key": key, "lineage": self.lineage, "ts": time.time(),
             "metrics": metrics}
        with self._wlock:
            with open(self.path, "a") as f:
                f.write(json.dumps(e) + "\n")
                f.flush()
                os.fsync(f.fileno())
            self._done[key] = e

    def _invalidate(self, key: str) -> None:
        """Append an entry that masks every prior completion of `key` (for
        ANY lineage). Written BEFORE run() mutates an existing partition
        dir, so a crash between the dir mutation and the new mark() leaves
        the manifest saying 'not done' instead of pointing a stale entry at
        another lineage's data (the A→B→A stale-serve window)."""
        e = {"key": key, "invalidated": True, "ts": time.time()}
        with self._wlock:
            with open(self.path, "a") as f:
                f.write(json.dumps(e) + "\n")
                f.flush()
                os.fsync(f.fileno())
            self._done.pop(key, None)

    def partition_dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    def run(self, key: str, fn) -> dict:
        """Execute fn(out_dir) for a partition unless already done.

        fn writes into a scratch dir; on success the scratch dir is renamed
        to the final partition dir and the manifest entry is appended.
        Returns the manifest entry."""
        if self.done(key):
            return self._done[key]
        final = self.partition_dir(key)
        # Single-writer assumption: one Manifest instance owns this root
        # (the driver). Concurrent writers on the same key would race the
        # final rename; shard different keys across writers instead.
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        # About to destroy/replace whatever sits at `final` (possibly
        # another lineage's completed data, or a tombstoned placeholder):
        # mask any prior manifest completion FIRST, so a crash anywhere in
        # the mutate window resumes as "not done" rather than serving the
        # wrong lineage's partition.
        if os.path.isdir(final) or os.path.exists(f"{final}.tombstone"):
            self._invalidate(key)
        shutil.rmtree(final, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        try:
            metrics = fn(tmp) or {}
        except BaseException:
            # never leave .tmp-* scratch dirs behind on failure
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        os.replace(tmp, final) if not os.path.isdir(final) else None
        if os.path.isdir(tmp):  # os.replace on dirs fails if final exists
            shutil.rmtree(final, ignore_errors=True)
            os.rename(tmp, final)
        metrics["wall_sec"] = round(time.time() - t0, 3)
        # recomputing a tombstoned key resurrects its data: drop the
        # placeholder so disk state never claims "reclaimed" next to a
        # live partition dir
        try:
            os.unlink(f"{final}.tombstone")
        except FileNotFoundError:
            pass
        self.mark(key, **metrics)
        return self._done[key]

    def tombstone(self, key: str) -> bool:
        """Reclaim a completed partition's space, keeping its manifest
        entry (logs/DESIGN.md tombstone semantics: once a shard's combine
        has consumed it, the checkpoint files may be deleted and replaced
        with a placeholder). done(key) stays True, so resume still skips
        the work; the placeholder records when the data was reclaimed."""
        if not self.done(key):
            return False
        final = self.partition_dir(key)
        shutil.rmtree(final, ignore_errors=True)
        with open(f"{final}.tombstone", "w") as f:
            json.dump({"key": key, "ts": time.time()}, f)
        return True


def cleanup_root(root: str, *, remove_unreferenced: bool = False,
                 min_tmp_age_sec: float = 0.0) -> dict:
    """GC a manifest root (the `--cleanup` analogue, logs/DESIGN.md:39-87).

    Removes orphaned ``*.tmp-*`` scratch dirs — Manifest.run cleans its
    scratch on failure and renames atomically, but a SIGKILLed run leaves
    orphans behind. ``min_tmp_age_sec`` guards against deleting the LIVE
    scratch of a concurrently running job: scratch dirs modified within the
    window are kept (0 = remove regardless; only safe when no job can be
    running against this root — the CLI defaults to one hour). With
    ``remove_unreferenced``, also removes partition dirs no manifest entry
    of ANY lineage references (stale output from a since-changed config)
    and ``*.tombstone`` placeholders whose key is likewise unreferenced.
    A placeholder sitting next to a LIVE partition dir (contradictory
    state) is always removed. Returns what was removed."""
    keys: set[str] = set()
    rootabs = os.path.abspath(root)

    def _protect_lineage_paths(value) -> None:
        # lineage values that name paths under the root (e.g. the
        # --from-logs ingested corpus at out/ingested) are live data the
        # checkpoints depend on, not stale output — never GC them
        if isinstance(value, dict):
            for v in value.values():
                _protect_lineage_paths(v)
        elif isinstance(value, str):
            p = os.path.abspath(value)
            if p != rootabs and p.startswith(rootabs + os.sep):
                keys.add(os.path.relpath(p, rootabs))

    mp = os.path.join(root, "manifest.jsonl")
    if os.path.exists(mp):
        with open(mp) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                    keys.add(e["key"])
                except (json.JSONDecodeError, KeyError):
                    continue
                _protect_lineage_paths(e.get("lineage") or {})
    removed = {"tmp": [], "unreferenced": [], "tombstones": []}
    if not os.path.isdir(root):
        return removed
    now = time.time()
    # Keys may be nested paths ("gen9ou/day=01"): a directory is partition
    # CONTENT if its root-relative path sits under some key, a partition if
    # it equals a key, and a parent of partitions if some key sits under
    # it. Only dirs in none of those relations are stale.
    for dirpath, dirnames, files in os.walk(root, topdown=True):
        for name in files:
            if not name.endswith(".tombstone"):
                continue
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            key = rel[:-len(".tombstone")]
            live_dir = os.path.isdir(os.path.join(root, key))
            if live_dir or (remove_unreferenced and key not in keys):
                try:
                    os.unlink(full)
                    removed["tombstones"].append(rel)
                except FileNotFoundError:
                    pass
        for d in sorted(dirnames):
            full = os.path.join(dirpath, d)
            rel = os.path.relpath(full, root)
            if ".tmp-" in d:
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    age = float("inf")
                if age >= min_tmp_age_sec:
                    shutil.rmtree(full, ignore_errors=True)
                    removed["tmp"].append(rel)
                dirnames.remove(d)
            elif rel in keys:
                dirnames.remove(d)  # referenced partition: don't descend
            elif any(k.startswith(rel + os.sep) for k in keys):
                continue  # parent of referenced partitions: descend
            elif remove_unreferenced:
                shutil.rmtree(full, ignore_errors=True)
                removed["unreferenced"].append(rel)
                dirnames.remove(d)
            else:
                dirnames.remove(d)  # unknown dir, not asked to remove
    return removed
