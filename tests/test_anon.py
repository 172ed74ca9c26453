"""Anonymizer (M8-M10): redaction, salted mode, leak verification,
deterministic sampling, ordinal rename."""

import json

import pytest

from stats_ray import synth
from stats_ray.stages.anon import (
    Verifier, anonymize_doc, ordinal_rename, sample_mask)


def _doc(i=3):
    return json.loads(synth.gen_battle(i)["doc"])


def test_players_renamed():
    doc = _doc()
    v = Verifier()
    anon = anonymize_doc(doc, verifier=v)
    assert anon["p1"] == "Player 1" and anon["p2"] == "Player 2"
    assert anon["winner"] in ("Player 1", "Player 2", "")
    assert doc["p1"] not in json.dumps(anon)
    assert v.ok(), v.leaks[:3]


def test_salted_mode_deterministic():
    doc = _doc()
    a1 = anonymize_doc(doc, salt="pepper")
    a2 = anonymize_doc(doc, salt="pepper")
    a3 = anonymize_doc(doc, salt="other")
    assert a1["p1"] == a2["p1"] != a3["p1"]
    assert len(a1["p1"]) == 10  # md5 hex truncated (anon/src/index.ts:446-452)


def test_nicknames_become_species():
    doc = _doc()
    # rename consistently: the stored name AND every protocol ident (the
    # anonymizer raises on idents it cannot map — anon/src/index.ts:433-440)
    old = doc["p1team"][0].get("name") or doc["p1team"][0]["species"]
    doc["p1team"][0]["name"] = "SuperSecretNick"
    doc["log"] = [ln.replace(f"p1a: {old}", "p1a: SuperSecretNick")
                  for ln in doc["log"]]
    anon = anonymize_doc(doc)
    names = [p["name"] for p in anon["p1team"]]
    assert "SuperSecretNick" not in names
    assert "SuperSecretNick" not in "\n".join(anon["log"])


def test_chat_lines_dropped_mechanics_kept():
    doc = _doc()
    doc["log"] = ["|c|☆Someone|hello there", "|j|Lurker",
                  "|turn|1", "|inactive|Someone has 270 seconds left.",
                  f"|win|{doc['p1']}"]
    anon = anonymize_doc(doc)
    assert anon["log"] == ["|turn|1", "|win|Player 1"]


def test_rating_simplified():
    doc = _doc()
    if doc["p1rating"]:
        doc["p1rating"]["extra_field"] = 123
        anon = anonymize_doc(doc)
        assert set(anon["p1rating"]) == {"rpr", "rprd"}
    assert "timestamp" not in anonymize_doc(doc)


def test_verifier_catches_planted_leak():
    v = Verifier()
    v.names.add("Alice")
    assert not v.verify("|c|Alice|hi", "|chat|Alice says hi")
    assert v.leaks


def test_input_log_filtered():
    doc = _doc()
    doc["inputLog"] = [">p1 move 1", "nonsense line", ">p2 switch 3"]
    anon = anonymize_doc(doc)
    assert anon["inputLog"] == [">p1 move 1", ">p2 switch 3"]


def test_sample_mask_deterministic_rate():
    ids = [f"battle-x-{i}" for i in range(4000)]
    m1 = sample_mask(ids, 0.25)
    m2 = sample_mask(ids, 0.25)
    assert m1 == m2
    assert 0.2 < sum(m1) / len(m1) < 0.3


def test_anonymize_pipeline_no_leaks(small_corpus):
    from stats_ray.stages.anon import anonymize_pipeline
    ds = anonymize_pipeline(small_corpus).materialize()
    df = ds.to_pandas()
    assert (df["leaks"] == 0).all()
    assert len(df) > 0
    # re-decode roundtrip: anonymized tokens are valid canonical JSON
    from stats_ray.tokens import decode_column
    import pyarrow as pa
    t = ds.limit(5).to_arrow_refs()
    sample = anonymize_pipeline(small_corpus).limit(5).take_batch(
        5, batch_format="pyarrow")
    docs = decode_column(sample["tokens"])
    for s in docs:
        json.loads(s)


def test_ordinal_rename_scaled_matches_simple(small_corpus):
    """Range-partitioned rank assignment must reproduce the simple
    one-group-per-format ordinals exactly."""
    from stats_ray.stages.anon import (anonymize_pipeline, ordinal_rename,
                                       ordinal_rename_scaled)
    base = anonymize_pipeline(small_corpus).materialize()
    simple = ordinal_rename(base).to_pandas()
    scaled = ordinal_rename_scaled(base, n_ranges=8).to_pandas()
    a = simple.sort_values("doc_id").reset_index(drop=True)
    b = scaled.sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["n_tok"].to_numpy() == b["n_tok"].to_numpy()).all()


def test_ordinal_rename(small_corpus):
    from stats_ray.stages.anon import anonymize_pipeline
    ds = anonymize_pipeline(small_corpus, rate=0.5)
    renamed = ordinal_rename(ds).to_pandas()
    for fmt, g in renamed.groupby("format"):
        ids = sorted(g["doc_id"])
        assert ids[0] == f"battle-{fmt}-1"
        assert len(set(ids)) == len(ids)
