"""OV metric semantics tests (hand-derived golden values)."""

import numpy as np

from mertools_tpu.ops import ov_metrics as ov


def test_string_to_list():
    assert ov.string_to_list("['happy', 'sad']") == ["happy", "sad"]
    assert ov.string_to_list(["a"]) == ["a"]
    assert ov.string_to_list("") == []
    assert ov.string_to_list("angry, calm") == ["angry", "calm"]
    assert ov.string_to_list(float("nan")) == []


def test_wheel_rows_and_cluster():
    rows = [
        ("Joy", "Cheerful", "happy"),
        ("", "", "amused"),
        ("", "Content", "satisfied"),
        ("Sadness", "Gloomy", "down"),
    ]
    wheel = ov.wheel_rows_to_map(rows)
    assert wheel == {
        "joy": {"cheerful": ["happy", "amused"], "content": ["satisfied"]},
        "sadness": {"gloomy": ["down"]},
    }
    c1 = ov.wheel_cluster_map(wheel, "level1")
    assert c1["happy"] == "joy" and c1["content"] == "joy" and c1["down"] == "sadness"
    c2 = ov.wheel_cluster_map(wheel, "level2")
    assert c2["happy"] == "cheerful" and c2["satisfied"] == "content"
    assert "joy" not in c2  # level1 words are not level2 cluster keys


def test_backward_cases():
    fmt = {"happiness": ["happy", "glad"], "joyful": ["joy"]}
    raw = {"happy": ["joy", "cheer"], "glad": ["joy"], "joy": ["joy"]}
    wheel = {"joy": "JOY-CLUSTER"}
    assert ov.backward_case1("happiness", fmt) == "glad"  # sorted-first
    assert ov.backward_case1("unknown", fmt) == ""
    assert ov.backward_case2("happiness", fmt, raw) == "joy"
    assert ov.backward_case3("happiness", fmt, raw, wheel) == "JOY-CLUSTER"
    assert ov.backward_case3("unknown", fmt, raw, wheel) == ""


def test_overlap_rate_golden():
    fmt = {w: [w] for w in ("happy", "sad", "angry", "calm")}
    raw = {w: [w] for w in ("happy", "sad", "angry", "calm")}
    name2gt = {"a": "['happy','sad']", "b": "['angry']", "c": "['calm']"}
    name2pred = {"a": "['happy']", "b": "['sad','angry']", "c": "[]"}
    acc, rec = ov.openset_overlap_rate(name2gt, name2pred, fmt, raw, None, "case1")
    # a: acc 1/1, rec 1/2; b: acc 1/2, rec 1/1; c: acc 0, rec 0
    np.testing.assert_allclose(acc, (1.0 + 0.5 + 0.0) / 3)
    np.testing.assert_allclose(rec, (0.5 + 1.0 + 0.0) / 3)


def test_wheel_metric_calculation():
    fmt = {w: [w] for w in ("happy", "glad", "down")}
    raw = {w: [w] for w in ("happy", "glad", "down")}
    wheels = {
        "wheel1": {"joy": {"cheerful": ["happy", "glad"]},
                   "sadness": {"gloomy": ["down"]}},
        "wheel2": {"positive": {"pos": ["happy", "glad"]},
                   "negative": {"neg": ["down"]}},
    }
    name2gt = {"x": "['happy']", "y": "['down']"}
    name2pred = {"x": "['glad']", "y": "['down']"}  # synonym via wheel cluster
    f, p, r = ov.wheel_metric_calculation(name2gt, name2pred, wheels, fmt, raw,
                                          level="level1")
    assert f == p == r == 1.0  # both wheels cluster happy/glad together


def test_mer2024_ov_metric_golden():
    name2gt = {"a": "['开心','兴奋']", "b": "['生气']"}
    name2pred = {"a": "['高兴']", "b": "['生气','难过']"}
    name2synonyms = {
        "a": [["开心", "高兴"], ["兴奋"]],
        "b": [["生气"], ["难过"]],
    }
    res = ov.mer2024_ov_metric(name2gt, name2pred, name2synonyms)
    # a: gt {开心,兴奋}, pred {开心} -> acc 1, rec 1/2
    # b: gt {生气}, pred {生气,难过} -> acc 1/2, rec 1
    np.testing.assert_allclose(res["accuracy"], 0.75)
    np.testing.assert_allclose(res["recall"], 0.75)
    np.testing.assert_allclose(res["avg_score"], 0.75)


def test_read_wheel_table_forward_fill(tmp_path):
    from mertools_tpu.ops.ov_metrics import load_wheels, read_wheel_table

    csv_path = tmp_path / "wheel1.csv"
    csv_path.write_text(
        "level1,level2,level3\n"
        "Joy,Serenity,calm\n"
        ",,peaceful\n"
        ",Ecstasy,excited\n"
        "Sadness,Grief,mournful\n", encoding="utf-8")
    w = read_wheel_table(str(csv_path))
    assert w["joy"]["serenity"] == ["calm", "peaceful"]
    assert w["joy"]["ecstasy"] == ["excited"]
    assert "sadness" in w

    wheels = load_wheels(str(tmp_path))
    assert list(wheels) == ["wheel1"]


def test_wheel_mapping_npz_roundtrip(tmp_path):
    """MER2026-T2 OUTSIDE_WHEEL_MAPPING npz layout (wheel.py:112-118):
    save/load roundtrip + case3 metric through the loaded maps; all-filtered
    sample sets score 0, not nan."""
    from mertools_tpu.ops.ov_metrics import (load_wheel_mapping,
                                             openset_overlap_rate,
                                             save_wheel_mapping,
                                             wheel_cluster_map)

    wheels = {"wheel1": {"joy": {"happy": ["cheerful", "merry"]},
                         "sad": {"down": ["gloomy"]}}}
    format_mapping = {"cheerful": ["happy"], "merry": ["happy"],
                      "gloomy": ["down"], "happy": ["happy"],
                      "down": ["down"]}
    raw_mapping = {"happy": ["joy"], "down": ["sad"]}
    path = str(tmp_path / "mapping.npz")
    save_wheel_mapping(path, format_mapping, raw_mapping, wheels)
    fm, rm, whole = load_wheel_mapping(path)
    assert fm == format_mapping and rm == raw_mapping
    assert whole["wheel1"]["level1"] == wheel_cluster_map(wheels["wheel1"],
                                                          "level1")

    name2gt = {"a": "['cheerful']", "b": "['gloomy']"}
    name2pred = {"a": "['merry']", "b": "['happy']"}
    acc, rec = openset_overlap_rate(
        name2gt, name2pred, fm, rm, whole["wheel1"]["level1"],
        metric="case3_wheel1_level1")
    assert acc == 0.5 and rec == 0.5  # a: both -> joy (hit); b: sad vs joy

    # every mapped GT empty -> 0/0 guard (unknown labels drop out)
    acc, rec = openset_overlap_rate({"x": "['unknownword']"},
                                    {"x": "['alsounknown']"}, fm, rm,
                                    whole["wheel1"]["level1"],
                                    metric="case3_wheel1_level1")
    assert acc == 0.0 and rec == 0.0


def test_parse_synonym_groups_reference_string_store():
    """Reference synonym stores hold the raw LLM response STRING
    (main-ov.py:47-49) — both that and pre-parsed lists must read back."""
    from mertools_tpu.cli.main_ov import _parse_synonym_groups

    s = "[['Agree', 'agreement'], ['Relaxed', 'relaxed']]"
    assert _parse_synonym_groups(s) == [["Agree", "agreement"],
                                        ["Relaxed", "relaxed"]]
    assert _parse_synonym_groups([["a", "b"]]) == [["a", "b"]]
    assert _parse_synonym_groups("not a list") == []
    assert _parse_synonym_groups("") == []
