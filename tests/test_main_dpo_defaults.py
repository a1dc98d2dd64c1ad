"""main_dpo per-judge decode defaults + chatunivi/videochatgpt wiring.

VERDICT round-3 #9: ``main_dpo --judge X`` with no decode flags must
reproduce ``MER2026_Track3/utils/X.py`` semantics; explicit flags
override. Also pins that every --judge choice has a defaults row and that
the two round-4 judge families are dispatchable.
"""

import argparse

import pytest

from mertools_tpu.cli import main_dpo


def _parse(argv):
    import unittest.mock as mock

    with mock.patch.object(argparse.ArgumentParser, "error",
                           side_effect=SystemExit):
        p_args = None

        def fake_fn(a):
            nonlocal p_args
            p_args = a

        # build the parser via main() but intercept the command fn
        import mertools_tpu.cli.main_dpo as m

        orig_judge, orig_score = m.cmd_judge, m.cmd_score
        m.cmd_judge = fake_fn
        m.cmd_score = fake_fn
        try:
            m.main(argv)
        finally:
            m.cmd_judge, m.cmd_score = orig_judge, orig_score
        return p_args


def test_defaults_fill_per_judge():
    for judge, want_t, want_n in [("salmonn", 1.0, 300),
                                  ("videollava", 0.1, 1024),
                                  ("videochatgpt", 0.2, 512),
                                  ("chatunivi", 0.2, 1024),
                                  ("llamavid", 0.5, 512),
                                  ("vita", 0.0, 1024),
                                  ("otter", 0.0, 512),
                                  ("pllava", 1.0, 200)]:
        args = argparse.Namespace(judge=judge, temperature=None,
                                  max_new_tokens=None)
        main_dpo.apply_judge_decode_defaults(args)
        assert args.temperature == want_t, judge
        assert args.max_new_tokens == want_n, judge


def test_explicit_flags_override():
    args = argparse.Namespace(judge="salmonn", temperature=0.0,
                              max_new_tokens=16)
    main_dpo.apply_judge_decode_defaults(args)
    assert args.temperature == 0.0 and args.max_new_tokens == 16


def test_parser_defaults_are_none_for_decode_flags():
    args = _parse(["judge", "--label_csv", "x.csv", "--save_npz", "y.npz"])
    assert args.temperature is None and args.max_new_tokens is None


def test_every_judge_choice_has_a_defaults_row():
    import inspect
    import re

    src = inspect.getsource(main_dpo.main)
    m = re.search(r"--judge.*?choices=\[(.*?)\]", src, re.S)
    choices = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert set(choices) == set(main_dpo.JUDGE_DECODE_DEFAULTS), (
        set(choices) ^ set(main_dpo.JUDGE_DECODE_DEFAULTS))
    assert {"chatunivi", "videochatgpt"} <= set(choices)


@pytest.mark.parametrize("judge,msg", [
    ("chatunivi", "--judge chatunivi needs"),
    ("videochatgpt", "--judge videochatgpt needs"),
])
def test_new_judges_dispatch(judge, msg):
    """The factory reaches the new branches (asserts on missing paths
    without loading any model)."""
    args = argparse.Namespace(judge=judge, ckpt=None, video_dir=None,
                              batch=1, max_new_tokens=8, temperature=0.2,
                              seed=0)
    with pytest.raises(AssertionError, match=msg):
        main_dpo._make_caller_factory(args)
