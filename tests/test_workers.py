"""Dynamic worker extension surface (SURVEY §2.11): `run --worker` loads
foreign worker code by path, merges its CLI options (two-phase reparse,
reference process:65-101), accept-gates formats, and drives apply/combine
over the parsed corpus."""

import json
import subprocess
import sys

import pandas as pd
import pytest

TOY_WORKER = '''
class Worker:
    """Counts battles per (format, day), keeping only formats that match a
    prefix option; combine tags each format's rows with its row rank."""

    options = {
        "prefix": {"desc": "format prefix gate", "alias": ["p"],
                   "parse": str, "default": ""},
        "min-turns": {"desc": "minimum turns", "alias": ["m"],
                      "parse": int, "default": 0},
    }

    def __init__(self, config):
        self.prefix = config["prefix"]
        self.min_turns = config["min-turns"]

    def accept(self, fmt):
        return fmt.startswith(self.prefix)

    def apply(self, ds):
        mt = self.min_turns
        if mt:
            ds = ds.filter(lambda r: r["turns"] >= mt)
        return ds.groupby(["format", "source"]).count()

    def combine(self, fmt, df):
        out = df.sort_values("source").reset_index(drop=True)
        out["rank"] = range(1, len(out) + 1)
        return out
'''


@pytest.fixture(scope="module")
def toy_worker(tmp_path_factory):
    p = tmp_path_factory.mktemp("workers") / "toy_worker.py"
    p.write_text(TOY_WORKER)
    return str(p)


def _run_cli(args, timeout=300):
    r = subprocess.run([sys.executable, "-m", "stats_ray.cli", *args],
                       capture_output=True, text=True, timeout=timeout,
                       cwd="/root/repo")
    return r


def test_load_worker_variants(toy_worker):
    from stats_ray.workers import BUILTIN_WORKERS, load_worker, \
        worker_options

    cls = load_worker(toy_worker + ":Worker")
    assert set(worker_options(cls)) == {"prefix", "min-turns"}
    # Class name defaults to Worker
    assert load_worker(toy_worker).__name__ == "Worker"
    # registry name and module:Class both resolve
    assert load_worker("stats/usage").__name__ == "UsageWorker"
    assert load_worker("stats_ray.workers:UsageWorker").__name__ == \
        "UsageWorker"
    assert "stats/usage" in BUILTIN_WORKERS
    with pytest.raises((FileNotFoundError, ImportError)):
        load_worker("/nope/missing.py:Worker")
    with pytest.raises(AttributeError):
        load_worker("stats_ray.workers:NoSuchClass")


@pytest.mark.slow
def test_cli_run_foreign_worker(small_corpus, toy_worker, tmp_path):
    out = str(tmp_path / "toy")
    r = _run_cli(["run", "--worker", toy_worker, "--corpus", small_corpus,
                  "--out", out, "--prefix", "gen9", "-m", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    n = json.loads(r.stdout.strip().splitlines()[-1])["rows"]
    df = pd.read_parquet(out)
    assert len(df) == n > 0
    # accept() gate pruned to the prefixed formats only
    assert all(str(f).startswith("gen9") for f in df["format"].unique())
    # combine() ran per format: rank is a 1..n sequence per format
    for _, g in df.groupby("format"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    # strict second-phase parse: unknown worker option fails loudly
    bad = _run_cli(["run", "--worker", toy_worker, "--corpus", small_corpus,
                    "--out", out, "--bogus", "1"])
    assert bad.returncode != 0
    assert "bogus" in bad.stderr


@pytest.mark.slow
def test_cli_run_registry_worker(small_corpus, tmp_path):
    out = str(tmp_path / "usage")
    r = _run_cli(["run", "--worker", "stats/usage",
                  "--corpus", small_corpus, "--out", out,
                  "--cutoff", "0"])
    assert r.returncode == 0, r.stderr[-2000:]
    df = pd.read_parquet(out)
    assert set(df["cutoff"].unique()) == {0.0}
    assert {"format", "cutoff", "species"}.issubset(df.columns)


RAW_WORKER = '''
class Worker:
    """Raw-input worker (input="raw", worker.ts:50-53 analogue): token
    volume per format straight off the tokens contract, no parse."""

    input = "raw"
    options = {}

    def __init__(self, config):
        pass

    def apply(self, ds):
        return ds.groupby("format").sum("n_tok")
'''


def test_run_worker_raw_input(ray_session, small_corpus, tmp_path):
    import ray.data

    from stats_ray.workers import load_worker, run_worker

    p = tmp_path / "raw_worker.py"
    p.write_text(RAW_WORKER)
    out = str(tmp_path / "rawout")
    res = run_worker(load_worker(str(p)), small_corpus, out, {})
    df = pd.read_parquet(out)
    assert res["rows"] == len(df) > 0
    # matches the corpus's own per-format token totals exactly
    battles = ray.data.read_parquet(f"{small_corpus}/battles").to_pandas()
    battles["format"] = battles["source"].str.split("/").str[0]
    want = battles.groupby("format")["n_tok"].sum()
    got = df.set_index("format")["sum(n_tok)"].sort_index()
    assert (got == want.sort_index()).all()


def test_run_worker_unpicklable_combine_fails_fast(ray_session,
                                                   small_corpus, tmp_path):
    """combine() executes on Ray workers (map_groups), so a combine-bearing
    worker holding unpicklable state must be rejected BEFORE any pipeline
    work runs — not with a cloudpickle TypeError after a long apply()."""
    from stats_ray.workers import run_worker

    class BadWorker:
        options = {}

        def __init__(self, config):
            import threading
            self.lock = threading.Lock()  # not picklable

        def apply(self, ds):  # pragma: no cover - must never be reached
            raise AssertionError("apply ran before the pickle check")

        def combine(self, fmt, df):  # pragma: no cover
            return df

    with pytest.raises(TypeError, match="not picklable"):
        run_worker(BadWorker, small_corpus, str(tmp_path / "bad"), {})


def test_run_worker_refuses_foreign_out_dir(ray_session, small_corpus,
                                            tmp_path):
    """The sink-rebuild rmtree must only ever delete a dir run_worker
    itself claimed (_WORKER_SINK.json) — a populated user dir is refused."""
    from stats_ray.workers import load_worker, run_worker

    out = tmp_path / "precious"
    out.mkdir()
    (out / "checkpoint.bin").write_bytes(b"do not delete")
    with pytest.raises(FileExistsError, match="refusing"):
        run_worker(load_worker("stats/usage"), small_corpus, str(out), {})
    assert (out / "checkpoint.bin").exists()


@pytest.mark.slow
def test_cli_run_anon_worker(small_corpus, tmp_path):
    # unsalted: synth nicknames equal species names, so pokemon.name ==
    # name and nothing enters the verifier -> leaks must be 0. (With a
    # salt the ORIGINAL nicknames are verifier names and species details
    # legitimately remain in the log, so the reference-documented
    # false-positive leaks appear — anon/src/index.ts:477-480.)
    out = str(tmp_path / "anonw")
    r = _run_cli(["run", "--worker", "anon/anonymize",
                  "--corpus", small_corpus, "--out", out, "-r", "0.5"])
    assert r.returncode == 0, r.stderr[-2000:]
    n = json.loads(r.stdout.strip().splitlines()[-1])["rows"]
    df = pd.read_parquet(out)
    assert len(df) == n
    assert 0 < n < 400  # rate 0.5 sampled
    assert (df["leaks"] == 0).all()
