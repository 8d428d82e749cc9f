"""Tests for the offline preprocessing CLIs on synthetic raw data."""

import csv
import json
import os

import numpy as np
import pytest

from vibertgrid_tpu.preprocessing.ephoie import parse_char, parse_char_bio
from vibertgrid_tpu.preprocessing.funsd import run_annotation_parser
from vibertgrid_tpu.preprocessing.split import de_split, split
from vibertgrid_tpu.preprocessing.sroie import (
    ground_truth_extraction,
    reference_cosine,
    true_cosine,
    count_vector,
)


def _write_jpg(path, h=40, w=30):
    from PIL import Image

    Image.fromarray(
        (np.full((h, w, 3), 240)).astype(np.uint8)
    ).save(path)


class TestSroie:
    def test_extraction_and_matching(self, tmp_path):
        img = tmp_path / "x.jpg"
        _write_jpg(str(img))
        bbox = tmp_path / "x.txt"
        bbox.write_text(
            "1,1,50,1,50,10,1,10,ACME TRADING SDN BHD\n"
            "1,12,50,12,50,20,1,20,25/03/2019\n"
            "1,22,50,22,50,30,1,30,TOTAL 72.10\n"
            "\n"
        )
        key = tmp_path / "x_key.txt"
        key.write_text(
            json.dumps(
                {
                    "company": "ACME TRADING SDN BHD",
                    "date": "25/03/2019",
                    "address": "42 EXAMPLE STREET",
                    "total": "72.10",
                }
            )
        )
        rows, shape = ground_truth_extraction(
            str(img), str(bbox), str(key), spilt_word=False
        )
        assert shape == (40, 30)
        assert rows[0]["data_class"] == 1  # company via cosine
        assert rows[1]["data_class"] == 2  # date via regex
        assert rows[2]["data_class"] == 4  # total via float match
        assert all(r["pos_neg"] == 1 for r in rows)

    def test_word_split_covers_line(self, tmp_path):
        img = tmp_path / "y.jpg"
        _write_jpg(str(img))
        bbox = tmp_path / "y.txt"
        bbox.write_text("0,0,100,0,100,10,0,10,AB CDEF\n")
        key = tmp_path / "y_key.txt"
        key.write_text(json.dumps({"company": "Z", "date": "", "address": "Z",
                                   "total": ""}))
        rows, _ = ground_truth_extraction(
            str(img), str(bbox), str(key), spilt_word=True
        )
        assert [r["text"] for r in rows] == ["AB", "CDEF"]
        assert rows[0]["left"] == 0 and rows[1]["left"] > rows[0]["right"] - 20

    def test_cosine_variants(self):
        a = count_vector("acme trading ltd")
        b = count_vector("acme trading sdn bhd")
        assert 0 < true_cosine(a, b) <= 1.0
        # reference arithmetic is different but correlated
        assert reference_cosine(a, b) > 0
        assert reference_cosine(a, a) > reference_cosine(a, count_vector("zzz www"))


class TestFunsd:
    def test_word_and_seg(self, tmp_path):
        ann = {
            "form": [
                {
                    "text": "Name:",
                    "label": "question",
                    "box": [1, 2, 30, 12],
                    "words": [
                        {"text": "Name:", "box": [1, 2, 30, 12]},
                    ],
                },
                {
                    "text": "",
                    "label": "other",
                    "box": [0, 0, 5, 5],
                    "words": [],
                },
            ]
        }
        for subset in ("training_data", "testing_data"):
            d = tmp_path / subset / "annotations"
            d.mkdir(parents=True)
            (d / "doc.json").write_text(json.dumps(ann))
        run_annotation_parser(str(tmp_path), "seg")
        out = tmp_path / "training_data" / "_label_csv" / "doc.csv"
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 1  # empty-text segment dropped
        assert rows[0]["text"] == "Name:" and rows[0]["data_class"] == "1"
        assert rows[0]["pos_neg"] == "1"


class TestEphoie:
    ANNOTATION = {
        "0": {
            "box": [0, 0, 30, 0, 30, 10, 0, 10],
            "string": "数学考试",
            "class": "VALUE",
            "tag": [2, 2, 0, 0],
        }
    }

    def test_char(self):
        rows = parse_char(self.ANNOTATION)
        assert len(rows) == 4
        assert [r["data_class"] for r in rows] == [2, 2, 0, 0]
        assert [r["pos_neg"] for r in rows] == [1, 1, 2, 2]
        widths = [r["right"] - r["left"] for r in rows]
        assert all(w == widths[0] for w in widths)

    def test_char_bio(self):
        rows = parse_char_bio(self.ANNOTATION)
        # class 2 → B-subject (3) then I-subject (4)
        assert [r["data_class"] for r in rows] == [3, 4, 0, 0]
        assert rows[0]["class_str"] == "B-subject"
        assert rows[1]["class_str"] == "I-subject"


class TestSplit:
    def test_roundtrip(self, tmp_path):
        root = tmp_path / "data"
        (root / "train" / "image").mkdir(parents=True)
        (root / "train" / "label").mkdir(parents=True)
        for i in range(10):
            (root / "train" / "image" / f"doc{i}.jpg").write_text("x")
            (root / "train" / "label" / f"doc{i}.csv").write_text("y")
        split(str(root), 0.3, seed=0)
        n_val = len(os.listdir(root / "validate" / "image"))
        assert n_val == 3
        assert len(os.listdir(root / "train" / "image")) == 7
        assert len(os.listdir(root / "validate" / "label")) == n_val
        de_split(str(root))
        assert len(os.listdir(root / "train" / "image")) == 10
        assert not (root / "validate").exists()
