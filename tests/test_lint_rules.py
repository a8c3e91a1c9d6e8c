"""Tests for tools/lint_rules.py — the ``sagan -T`` config-test analog:
a deliberately broken ruleset produces located errors; the shipped
rulesets lint clean."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.lint_rules import lint  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")

BROKEN = """\
# line 1 is a comment
alert any any any -> any any (msg:"ok"; content:"x"; sid:10;)
alert any any any -> any any (msg:"no sid"; content:"y";)
alert any any any -> any any (msg:"dup"; content:"z"; sid:10;)
var BADVAR
alert any any any -> any any (msg:"bad class"; content:"q"; \\
classtype:no-such-class; sid:11;)
alert any any any -> any any (msg:"bad load"; content:"w"; dynamic_load:/no/such.rules; sid:12;)
alert any any any -> any any no option body here
"""


def test_broken_ruleset_errors_are_located(tmp_path):
    p = tmp_path / "bad.rules"
    p.write_text(BROKEN)
    cls = tmp_path / "classification.config"
    cls.write_text("config classification: misc,Misc,3\n")
    errors = lint([str(p)], str(cls))
    text = "\n".join(errors)
    assert f"{p}:3" in text and "missing sid" in text
    assert f"{p}:4" in text and "duplicate sid 10" in text
    assert f"{p}:5" in text and "malformed var" in text
    # continuation rule: error located at its FIRST line (6)
    assert f"{p}:6" in text and "no-such-class" in text
    assert f"{p}:8" in text and "dynamic_load" in text
    assert f"{p}:9" in text and "no option body" in text
    assert len(errors) == 6


def test_shipped_rulesets_lint_clean():
    paths = sorted(glob.glob(os.path.join(REPO, "rulesets", "*.rules")))
    assert paths
    errors = lint(paths, os.path.join(REPO, "rulesets",
                                      "classification.config"))
    assert errors == [], errors


def test_missing_classification_file_is_reported(tmp_path):
    p = tmp_path / "ok.rules"
    p.write_text('alert any any any -> any any (msg:"m"; content:"c"; sid:1;)\n')
    errors = lint([str(p)], str(tmp_path / "nope.config"))
    assert len(errors) == 1 and "nope.config" in errors[0]
