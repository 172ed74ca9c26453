"""Regenerate the monowater shard self-goldens (tests/goldens/monotype/).

Run after an INTENDED semantic change to the tag-shard projection:
    python tests/goldens/regen_monotype.py
Uses the same deterministic 400-battle synth corpus as the pytest
fixture, so the snapshot is stable across machines.
"""

import os
import shutil
import sys
import tempfile

import ray


def main():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from stats_ray import synth
    from stats_ray.pipelines import usage as pl

    here = os.path.dirname(os.path.abspath(__file__))
    golden_dir = os.path.join(here, "monotype")
    with tempfile.TemporaryDirectory() as tmp:
        corpus = os.path.join(tmp, "corpus")
        synth.build_corpus(corpus, 400)
        parsed = pl.parse_pipeline(corpus).materialize()
        out = os.path.join(tmp, "reports")
        written = pl.render_monotype_reports(parsed, out, tags=["monowater"])
        if not written:
            print("no gen9monotype battles in corpus — nothing written")
            return 1
        os.makedirs(golden_dir, exist_ok=True)
        for paths in written.values():
            for path in paths.values():
                shutil.copy(path, os.path.join(golden_dir,
                                               os.path.basename(path)))
        print(f"wrote {sum(len(p) for p in written.values())} goldens "
              f"to {golden_dir}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
