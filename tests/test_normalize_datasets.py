"""Per-dataset raw->normalized converters (data/normalize.py vs
toolkit/preprocess/* semantics), driven via synthetic raw distributions."""

import csv
import os
import pickle

import numpy as np
import pytest

from mertools_tpu.cli.preprocess import main as preprocess_main


def _wcsv(path, header, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_normalize_meld(tmp_path):
    root = str(tmp_path / "raw")
    for split, fname in (("train", "train_sent_emo.csv"),
                         ("dev", "dev_sent_emo.csv"),
                         ("test", "test_sent_emo.csv")):
        _wcsv(os.path.join(root, fname),
              ["Dialogue_ID", "Utterance_ID", "Emotion", "Utterance"],
              [[0, 0, "joy", f"{split} hello"], [0, 1, "anger", "grr"]])
    save = str(tmp_path / "out")
    preprocess_main(["normalize-dataset", "--dataset=meld",
                     f"--data_root={root}", f"--save_root={save}"])
    lab = np.load(os.path.join(save, "label.npz"), allow_pickle=True)
    train = lab["train_corpus"].item()
    assert train["train_dia0_utt0"] == {"emo": 1, "val": -10}  # joy -> 1
    assert train["train_dia0_utt1"]["emo"] == 0                # anger -> 0
    with open(os.path.join(save, "transcription.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["name"] == "train_dia0_utt0"
    assert rows[0]["english"] == "train hello"
    assert len(rows) == 6


def test_normalize_simsv2(tmp_path):
    root = str(tmp_path / "raw")
    _wcsv(os.path.join(root, "meta.csv"),
          ["video_id", "clip_id", "text", "label", "mode"],
          [["vidA", "0001", "ni hao", 0.6, "train"],
           ["vidA", "0002", "zai jian", -0.2, "valid"],
           ["vidB", "0001", "xie xie", 0.0, "test"]])
    save = str(tmp_path / "out")
    preprocess_main(["normalize-dataset", "--dataset=simsv2",
                     f"--data_root={root}", f"--save_root={save}"])
    lab = np.load(os.path.join(save, "label.npz"), allow_pickle=True)
    assert lab["train_corpus"].item()["vidA_0001"] == {"emo": 0, "val": 0.6}
    assert lab["val_corpus"].item()["vidA_0002"]["val"] == -0.2
    assert "vidB_0001" in lab["test_corpus"].item()


def test_normalize_sims(tmp_path):
    root = str(tmp_path / "raw")
    _wcsv(os.path.join(root, "metadata/sentiment/label_M.csv"),
          ["video_id", "clip_id", "label"],
          [["v1", "1", 0.4], ["v1", "2", -0.8], ["v2", "1", 0.0]])
    for split, idx in (("train", [0]), ("val", [1]), ("test", [2])):
        _wcsv(os.path.join(root, "metadata", f"{split}_index.csv"),
              ["index"], [[i] for i in idx])
    _wcsv(os.path.join(root, "metadata/Translation.csv"),
          ["video_id", "clip_id", "Chinese", "English"],
          [["v1", "1", "chi1", "eng1"], ["v1", "2", "chi2", "eng2"],
           ["v2", "1", "chi3", "eng3"]])
    save = str(tmp_path / "out")
    preprocess_main(["normalize-dataset", "--dataset=sims",
                     f"--data_root={root}", f"--save_root={save}"])
    lab = np.load(os.path.join(save, "label.npz"), allow_pickle=True)
    assert lab["train_corpus"].item() == {"v1_0001": {"emo": 0, "val": 0.4}}
    assert lab["test_corpus"].item() == {"v2_0001": {"emo": 0, "val": 0.0}}
    with open(os.path.join(save, "transcription.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows[0] == {"name": "v1_0001", "chinese": "chi1",
                       "english": "eng1"}


def test_normalize_cmu_and_iemocap(tmp_path):
    # community 7-tuple pkl (cmumosi/cmumosei layout)
    videoIDs = {"vidA": ["vidA_1", "vidA_2"], "vidB": ["vidB_1"]}
    videoLabels = {"vidA": [0.5, -0.5], "vidB": [1.5]}
    videoSentences = {"vidA": ["hi", "bye"], "vidB": ["ok"]}
    pkl7 = str(tmp_path / "cmu.pkl")
    with open(pkl7, "wb") as f:
        pickle.dump((videoIDs, videoLabels, None, videoSentences,
                     {"vidA"}, set(), {"vidB"}), f)
    save = str(tmp_path / "cmu_out")
    preprocess_main(["normalize-dataset", "--dataset=cmumosi",
                     f"--label_pkl={pkl7}", f"--save_root={save}"])
    lab = np.load(os.path.join(save, "label.npz"), allow_pickle=True)
    assert lab["train_corpus"].item()["vidA_1"] == {"emo": 0, "val": 0.5}
    assert lab["test_corpus"].item()["vidB_1"]["val"] == 1.5

    # iemocap 6-tuple pkl + session transcript txt
    pkl6 = str(tmp_path / "iemocap.pkl")
    with open(pkl6, "wb") as f:
        pickle.dump(({"d1": ["Ses01F_impro01_F000"]}, {"d1": [2]},
                     None, None, {"d1"}, set()), f)
    raw = tmp_path / "iemocap_raw" / "Session1" / "dialog" / "transcriptions"
    raw.mkdir(parents=True)
    (raw / "Ses01F_impro01.txt").write_text(
        "Ses01F_impro01_F000 [006.2901-008.2357]: Excuse me.\n"
        "BADLINE\n")
    save2 = str(tmp_path / "iemo_out")
    preprocess_main(["normalize-dataset", "--dataset=iemocap",
                     f"--label_pkl={pkl6}",
                     f"--data_root={tmp_path / 'iemocap_raw'}",
                     f"--save_root={save2}", "--ways=4"])
    lab = np.load(os.path.join(save2, "label-4way.npz"), allow_pickle=True)
    assert lab["whole_corpus"].item()["Ses01F_impro01_F000"]["emo"] == 2
    with open(os.path.join(save2, "transcription.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows == [{"name": "Ses01F_impro01_F000",
                     "english": "Excuse me."}]


def test_normalize_mer2023(tmp_path):
    root = str(tmp_path / "raw")
    for split in ("train", "test1", "test2", "test3"):
        _wcsv(os.path.join(root, f"{split}-label.csv"),
              ["name", "discrete", "valence"],
              [[f"{split}_c1", "happy", 2.5], [f"{split}_c2", "sad", -1.0]])
    save = str(tmp_path / "out")
    preprocess_main(["normalize-dataset", "--dataset=mer2023",
                     f"--data_root={root}", f"--save_root={save}"])
    lab = np.load(os.path.join(save, "label-6way.npz"), allow_pickle=True)
    assert lab["train_corpus"].item()["train_c1"] == {"emo": "happy",
                                                      "val": 2.5}
    # test3 has no valence in the reference -> -10
    assert lab["test3_corpus"].item()["test3_c1"]["val"] == -10.0


def test_normalize_mer2024_and_scan_faces(tmp_path):
    root = str(tmp_path / "raw")
    _wcsv(os.path.join(root, "label-disdim.csv"),
          ["name", "discrete", "valence"],
          [["clipA", "happy", 0.5], ["clipB", "sad", -0.5]])
    os.makedirs(os.path.join(root, "video-labeled"))
    os.makedirs(os.path.join(root, "video-unlabeled-with-test2noise"))
    for n in ("clipA", "clipB"):
        open(os.path.join(root, "video-labeled", n + ".mp4"), "w").close()
    open(os.path.join(root, "video-unlabeled-with-test2noise", "u1.avi"),
         "w").close()
    save = str(tmp_path / "out")
    preprocess_main(["normalize-dataset", "--dataset=mer2024",
                     f"--data_root={root}", f"--save_root={save}",
                     "--copy_videos"])
    lab = np.load(os.path.join(save, "label-6way.npz"), allow_pickle=True)
    train = lab["train_corpus"].item()
    assert train == {"clipA": {"emo": "happy"}, "clipB": {"emo": "sad"}}
    test1 = lab["test1_corpus"].item()
    assert test1 == {"u1": {"emo": "neutral"}}  # unlabeled pool -> neutral
    assert os.path.exists(os.path.join(save, "video", "u1.avi"))

    # the reader maps the string labels and tolerates the missing val key
    from mertools_tpu.data.labels import read_names_labels
    names, emos, vals = read_names_labels(
        os.path.join(save, "label-6way.npz"), "train")
    assert sorted(names) == ["clipA", "clipB"]
    assert vals[0] == -10.0

    # scan-faces: frame counts + short-clip pruning (mer2023_unlabel.py)
    faces = tmp_path / "faces"
    for name, n_frames in (("ok", 20), ("short", 3)):
        d = faces / name
        d.mkdir(parents=True)
        np.save(d / f"{name}.npy", np.zeros((n_frames, 4, 4, 3), np.uint8))
    (faces / "broken").mkdir()  # missing npy -> counted as 0
    out_npz = str(tmp_path / "name2len.npz")
    preprocess_main(["scan-faces", f"--face_root={faces}",
                     f"--save_path={out_npz}", "--delete_short"])
    n2l = np.load(out_npz, allow_pickle=True)["name2len"].item()
    assert n2l == {"ok": 20, "short": 3, "broken": 0}
    assert os.path.isdir(faces / "ok")
    assert not os.path.isdir(faces / "short")
    assert not os.path.isdir(faces / "broken")


def test_normalize_mer2025_and_mer2026(tmp_path):
    """Track1 layouts (mer2025.py:31-66 / mer2026.py:33-66): train csv +
    candidate csv (neutral pre-release) or gt test csv -> track1_label_6way
    npz + subtitle passthrough."""
    from mertools_tpu.data.normalize import (normalize_mer2025,
                                             normalize_mer2026)

    def read_corpus(path):
        lab = np.load(path, allow_pickle=True)
        return {k[:-len("_corpus")]: lab[k].item() for k in lab.files
                if k.endswith("_corpus")}

    d25 = tmp_path / "raw25"; d25.mkdir()
    (d25 / "track1_train_disdim.csv").write_text(
        "name,discrete,valence\nt0,happy,0.5\nt1,sad,-0.5\n")
    (d25 / "track_all_candidates.csv").write_text("name\nc0\nc1\nc2\n")
    (d25 / "subtitle_chieng.csv").write_text(
        "name,chinese,english\nt0,x,hello\n")
    out = normalize_mer2025(str(d25), str(tmp_path / "p25"))
    corpus = read_corpus(out)
    assert corpus["train"]["t0"]["emo"] == "happy"
    assert corpus["test1"]["c2"]["emo"] == "neutral"  # no gt pre-release
    assert (tmp_path / "p25" / "track1_subtitle_chieng.csv").exists()

    d26 = tmp_path / "raw26"; d26.mkdir()
    (d26 / "track1_train.csv").write_text("name,discrete\ni0,angry\n")
    (d26 / "track1_test.csv").write_text("name,discrete\nj0,worried\n")
    out = normalize_mer2026(str(d26), str(tmp_path / "p26"))
    corpus = read_corpus(out)
    assert corpus["train"]["i0"]["emo"] == "angry"
    assert corpus["test1"]["j0"]["emo"] == "worried"  # gt test csv wins
