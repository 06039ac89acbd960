"""The bisect decoder (tools/bisect_report.py) must map every
diagnostic red/green combination to the intended hypothesis-class
conclusion — round 11 will act on its output, so the decision table
itself is regression-tested here (pure python, no Spark)."""

from __future__ import annotations

import json


def _artifact(tmp_path, **flags):
    d = {
        name: {"rows_match": True, "schema_match": True, "hash_match": ok}
        for name, ok in flags.items()
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(d))
    return str(p)


def _run(path, capsys):
    from tools.bisect_report import main

    assert main(path) == 0
    return capsys.readouterr().out


def test_all_green_resolves_both(tmp_path, capsys):
    out = _run(
        _artifact(
            tmp_path,
            retrieval_hits=True,
            retrieval_scores=True,
            label_vote=True,
            rater_agreement=True,
        ),
        capsys,
    )
    assert "retrieval: RESOLVED" in out
    assert "annotation: RESOLVED" in out
    assert "diagnostic reds: none" in out


def test_hits_green_scores_red_isolates_emission(tmp_path, capsys):
    out = _run(
        _artifact(
            tmp_path,
            retrieval_hits=True,
            retrieval_scores=False,
            label_vote=True,
            rater_agreement=True,
        ),
        capsys,
    )
    assert "membership EXACT" in out


def test_hits_red_points_at_ranking_layer(tmp_path, capsys):
    out = _run(
        _artifact(
            tmp_path,
            retrieval_hits=False,
            retrieval_scores=False,
            label_vote=True,
            rater_agreement=True,
        ),
        capsys,
    )
    assert "RANKING/MEMBERSHIP" in out


def test_both_annotation_legs_red_points_below(tmp_path, capsys):
    out = _run(
        _artifact(
            tmp_path,
            retrieval_hits=True,
            retrieval_scores=True,
            label_vote=False,
            rater_agreement=False,
        ),
        capsys,
    )
    assert "BOTH legs red" in out


def test_pre_surgery_artifact_reports_no_information(tmp_path, capsys):
    p = tmp_path / "old.json"
    p.write_text(json.dumps({"stats_panel": {"hash_match": True}}))
    out = _run(str(p), capsys)
    assert "predates the round-10 window surgery" in out
