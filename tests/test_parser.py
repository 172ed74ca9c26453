"""Parser state machine + canonicalization vs the synthesizer's forward model
(and the reference's error cases, stats/src/test/parser.test.ts:21-71)."""

import json

import pytest

from stats_ray import synth
from stats_ray.stages.parse import ParseError, canonicalize_team, parse_battle
from stats_ray.tokens import encode_str, decode_column, encode_strings


def _roundtrip(i: int):
    row = synth.gen_battle(i)
    doc = json.loads(row["doc"])
    return row, doc


@pytest.mark.parametrize("i", range(0, 120))
def test_parse_matches_ground_truth(i):
    row, doc = _roundtrip(i)
    b = parse_battle(doc, row["format"], row["singles"])
    got = [(m[0], m[1], m[2]) for m in b["matchups"]]
    want = [(m["s1"], m["s2"], m["outcome"]) for m in row["matchups"]]
    assert got == want
    assert b["winner"] == row["winner"]
    for s in row["slots"]:
        m = b["mons"]["p1" if s["side"] == 1 else "p2"][s["slot"]]
        assert m["turnsOut"] == s["turns_out"]
        assert m["kos"] == s["kos"]


def test_canonicalization_matches_ground_truth():
    for i in range(60):
        row, doc = _roundtrip(i)
        for side in (1, 2):
            team = canonicalize_team(doc[f"p{side}team"])
            gts = [s for s in row["slots"] if s["side"] == side]
            for mon, gt in zip(team, gts):
                assert mon["species"] == gt["species"]
                assert mon["item"] == gt["item"]
                assert mon["ability"] == gt["ability"]
                assert mon["nature"] == gt["nature"]
                assert mon["moves"] == [gt[f"move{k}"] for k in range(1, 5)]
                assert mon["happiness"] == gt["happiness"]
                assert mon["level"] == gt["level"]
                assert mon["tera"] == gt["tera"]


def _base_doc():
    row, doc = _roundtrip(3)
    return doc


def test_error_no_turn_count():
    doc = _base_doc()
    del doc["turns"]
    with pytest.raises(ParseError, match="No turn count"):
        parse_battle(doc, "gen9ou", True)


def test_error_two_winners():
    doc = _base_doc()
    doc["log"] = [f"|win|{doc['p1']}", f"|win|{doc['p2']}"]
    with pytest.raises(ParseError, match="two winners"):
        parse_battle(doc, "gen9ou", True)


def test_error_self_battle():
    doc = _base_doc()
    doc["p2"] = doc["p1"]
    doc["log"] = []
    with pytest.raises(ParseError, match="battling themself"):
        parse_battle(doc, "gen9ou", True)


def test_error_bad_move_line():
    doc = _base_doc()
    doc["log"] = ["|switch|p1a: A|Garchomp, L100|100/100",
                  "|switch|p2a: B|Heatran, L100|100/100",
                  "|move|p1a: A"]
    doc["p1team"][0]["species"] = "Garchomp"
    doc["p1team"][0]["name"] = "A"
    doc["p2team"][0]["species"] = "Heatran"
    doc["p2team"][0]["name"] = "B"
    with pytest.raises(ParseError, match="Could not parse line"):
        parse_battle(doc, "gen9ou", True)


def test_error_unknown_species():
    doc = _base_doc()
    doc["p1team"][0]["species"] = "NotAMon"
    doc["p1team"][0]["name"] = "NotAMon"
    with pytest.raises(ParseError, match="Unknown species"):
        parse_battle(doc, "gen9ou", True)


def test_nickname_prefix_identification():
    """Truncated stored nicknames resolve via the prefix path
    (parser.ts:358-377)."""
    doc = _base_doc()
    doc["p1team"] = doc["p1team"][:2]
    doc["p2team"] = doc["p2team"][:2]
    doc["p1team"][0].update({"species": "Garchomp", "name": "Mister Lon"})
    doc["p1team"][1].update({"species": "Heatran", "name": "Tran"})
    doc["p2team"][0].update({"species": "Blissey", "name": "Bliss"})
    doc["p2team"][1].update({"species": "Skarmory", "name": "Skarm"})
    doc["turns"] = 1
    doc["log"] = [
        "|switch|p1a: Mister Long|Garchomp, L100|100/100",
        "|switch|p2a: Bliss|Blissey, L100|100/100",
        "|turn|1",
        f"|win|{doc['p1']}",
    ]
    b = parse_battle(doc, "gen9ou", True)
    assert b["mons"]["p1"][0]["turnsOut"] == 1


def test_token_passthrough():
    row, _ = _roundtrip(7)
    toks = encode_str(row["doc"])
    col = encode_strings([row["doc"]])
    assert col[0].values.to_pylist() == toks.tolist()
    decoded = decode_column(col)
    assert decoded == [row["doc"]]


def test_parse_quarantine_accounts_bad_docs(ray_session, small_corpus,
                                            tmp_path):
    """Malformed battles land in the errors side with their doc ids; the
    good side matches a strict parse of the untouched docs."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from stats_ray.pipelines.usage import parse_pipeline, parse_with_quarantine

    src = glob.glob(f"{small_corpus}/battles/**/*.parquet", recursive=True)
    t = pa.concat_tables([pq.read_table(p) for p in src])
    # corrupt two docs: truncate their token payload mid-JSON
    bad_ids = set(t["doc_id"].to_pylist()[:2])
    toks = t["tokens"].to_pylist()
    docs = t["doc_id"].to_pylist()
    toks = [tk[:5] if d in bad_ids else tk for d, tk in zip(docs, toks)]
    t = t.set_column(t.schema.get_field_index("tokens"),
                     "tokens", pa.array(toks, type=t["tokens"].type))
    d = tmp_path / "battles"
    d.mkdir()
    pq.write_table(t, str(d / "part.parquet"))

    good, errors = parse_with_quarantine(str(tmp_path), concurrency=2)
    err = errors.to_pandas()
    assert set(err["doc_id"]) == bad_ids
    assert (err["parse_error"] != "").all()
    # the good side equals a plain drop-mode parse of the same corpus
    # (other rows may be legitimately gated: short battles, skip formats)
    baseline = parse_pipeline(str(tmp_path), strict=False,
                              concurrency=2).count()
    assert good.count() == baseline
    assert "parse_error" not in good.schema().names
