import json
import os
import tempfile
import types

import numpy as np

from pointcept_tpu.engines.test import SemSegTester


def _fake_tester(ds_type, dataset=None):
    t = SemSegTester.__new__(SemSegTester)
    t.cfg = types.SimpleNamespace(data=types.SimpleNamespace(test={"type": ds_type}))
    t.cfg.data.test = type("C", (), {"type": ds_type, "get": lambda self, k, d=None: d})()
    t.test_dataset = dataset
    return t


def test_semantic_kitti_submission_label_format():
    from pointcept_tpu.datasets.semantic_kitti import SemanticKITTIDataset

    ds = types.SimpleNamespace(learning_map_inv=SemanticKITTIDataset.get_learning_map_inv(-1))
    t = _fake_tester("SemanticKITTIDataset", ds)
    pred = np.array([0, 1, 8, 18], np.int64)  # car, bicycle, road, traffic-sign
    with tempfile.TemporaryDirectory() as d:
        t.write_submission(d, "08_000123", pred)
        p = os.path.join(d, "sequences", "08", "predictions", "000123.label")
        assert os.path.isfile(p)
        out = np.fromfile(p, dtype=np.uint32)
        inv = ds.learning_map_inv
        np.testing.assert_array_equal(out, [inv[0], inv[1], inv[8], inv[18]])


def test_nuscenes_submission_bin_format():
    from pointcept_tpu.datasets.nuscenes import NuScenesDataset

    ds = types.SimpleNamespace(learning_map_inv=NuScenesDataset.get_learning_map_inv(-1))
    t = _fake_tester("NuScenesDataset", ds)
    pred = np.array([0, 3, 15], np.int64)
    with tempfile.TemporaryDirectory() as d:
        t.write_submission(d, "sample_token_abc", pred)
        p = os.path.join(d, "lidarseg", "test", "sample_token_abc_lidarseg.bin")
        out = np.fromfile(p, dtype=np.uint8)
        np.testing.assert_array_equal(out, [9, 17, 30])


def test_nuscenes_maps_roundtrip():
    from pointcept_tpu.datasets.nuscenes import NuScenesDataset

    lm = NuScenesDataset.get_learning_map(-1)
    inv = NuScenesDataset.get_learning_map_inv(-1)
    # every learned class maps back to a raw id that maps to the same class
    for cls in range(16):
        assert lm[inv[cls]] == cls


def test_insseg_rle_submission():
    from pointcept_tpu.engines.test import InsSegTester

    t = InsSegTester.__new__(InsSegTester)
    with tempfile.TemporaryDirectory() as d:
        t.cfg = types.SimpleNamespace(save_path=d)
        masks = [np.array([0, 1, 1, 0, 1], bool), np.array([1, 1, 0, 0, 0], bool)]
        classes = [3, 7]
        scores = [0.9, 0.4]
        t.write_submission("scene0000_00", masks, classes, scores)
        txt = open(os.path.join(d, "result", "submit", "scene0000_00.txt")).read().strip().splitlines()
        assert txt[0].endswith(" 3 0.9000") and txt[1].endswith(" 7 0.4000")
        rle = json.load(open(os.path.join(d, "result", "submit", "predicted_masks", "scene0000_00_000.json")))
        assert rle["length"] == 5
        # decode RLE back: start/len pairs
        runs = list(map(int, rle["counts"].split()))
        decoded = np.zeros(5, np.uint8)
        for s, l in zip(runs[::2], runs[1::2]):
            decoded[s - 1 : s - 1 + l] = 1
        np.testing.assert_array_equal(decoded, masks[0].astype(np.uint8))
