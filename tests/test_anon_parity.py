"""Anonymizer parity with the reference's own goldens (M8-M10).

Mirrors anon/src/index.test.ts exactly: the raw battle log at
anon/src/testdata/raw.json must anonymize to anon.json (no salt) and
salt.json (salt='salt') with zero verifier leaks; the planted-nickname
variant ('aaaaaaaaaa' -> 'Air Lock') must still produce anon.json while
the verifier reports exactly the one known false-positive leak; and the
team fixture must map to the reference's species / salted-hash names.
"""

import json
import os

import pytest

from stats_ray.stages.anon import Verifier, anonymize_doc, anonymize_team

TESTDATA = "/root/reference/anon/src/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not available")


def _load(name):
    with open(os.path.join(TESTDATA, name)) as f:
        return json.load(f)


def test_anonymize_matches_reference_golden():
    raw = _load("raw.json")
    expected = _load("anon.json")
    v = Verifier()
    got = anonymize_doc(raw, verifier=v, dex_name="legacy")
    assert got == expected
    assert v.ok(), v.leaks[:5]


def test_anonymize_salted_matches_reference_golden():
    raw = _load("raw.json")
    expected = _load("salt.json")
    v = Verifier()
    got = anonymize_doc(raw, salt="salt", verifier=v, dex_name="legacy")
    assert got == expected
    assert v.ok(), v.leaks[:5]


def test_planted_nickname_leak_detected():
    with open(os.path.join(TESTDATA, "raw.json")) as f:
        text = f.read()
    mod = json.loads(text.replace("aaaaaaaaaa", "Air Lock"))
    expected = _load("anon.json")
    v = Verifier()
    got = anonymize_doc(mod, verifier=v, dex_name="legacy")
    assert got == expected
    assert not v.ok()
    assert v.leaks == [{
        "input": "|-ability|p2a: Air Lock|Air Lock",
        "output": "|-ability|p2a: Rayquaza|Air Lock",
    }]


def test_anonymize_team_matches_reference_golden():
    team = _load("team.json")
    plain = anonymize_team(team, dex_name="legacy")
    assert [p["name"] for p in plain] == [
        "Rayquaza", "Greninja", "Meloetta", "Zoroark", "Ditto", "Shedinja"]
    salted = anonymize_team(team, salt="salt", dex_name="legacy")
    assert [p["name"] for p in salted] == [
        "64bd07b346", "d677adb2c9", "962d76aee3",
        "a8d7f93b51", "ce04869101", "46ea409020"]
