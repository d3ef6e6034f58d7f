"""Data-layer tests: cropper, preprocessing invariants, splits, dataset.

Oracles are closed-form properties of the reference implementations
(SURVEY.md §4): window count ``ceil((n-crop_len)/step)`` (``datasets.py:16-25``),
pad/subsample + centering invariants (``datasets.py:127-150``), split
ratios/unseen complement/filename contract (``datasets.py:182-379``).
"""

import os
import pickle

import numpy as np
import pytest

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO, SPLIT
from opensetgaitrecognition_pcaa_tpu.data.dataset import (
    RadarCropDataset,
    epoch_batch_indices,
    parse_crop_filename,
)
from opensetgaitrecognition_pcaa_tpu.data.preprocess import (
    crop_with_step,
    process_frames,
    process_track,
)


class TestCropWithStep:
    def test_window_count_formula(self):
        for n, crop_len, step in [(100, 30, 6), (31, 30, 6), (30, 30, 6), (90, 30, 6)]:
            seq = np.arange(n)[:, None] * np.ones((1, 3))
            crops = crop_with_step(seq, crop_len, step)
            expected = int(np.ceil((n - crop_len) / step)) if n > crop_len else 0
            assert len(crops) == expected, (n, crop_len, step)

    def test_window_contents(self):
        seq = np.arange(50, dtype=np.float64)
        crops = crop_with_step(seq, 10, 4)
        for i, c in enumerate(crops):
            np.testing.assert_array_equal(c, np.arange(i * 4, i * 4 + 10))

    def test_exact_length_sequence_yields_zero_crops(self):
        # Reference quirk: arange(n - crop_len) is exclusive (datasets.py:24).
        assert len(crop_with_step(np.zeros((30, 2)), 30, 6)) == 0


def _frame(n_pts, rng):
    return {
        "cardinality": np.array([n_pts]),
        "elements": rng.normal(size=(n_pts, 2)),
        "z_coord": rng.uniform(0, 2, n_pts),
        "dopplers": rng.normal(size=n_pts),
        "powers": rng.uniform(0.1, 10, n_pts),
    }


class TestProcessFrames:
    def test_shapes_and_padding(self):
        rng = np.random.default_rng(0)
        frames = [_frame(10, rng), _frame(80, rng), _frame(64, rng)]
        out = process_frames(frames, nmax=64, standardize_point_cloud=False)
        assert out.shape == (3, 64, 4)
        # Padded frame: first 10 rows are the original points; the rest are
        # copies of them (pad-by-repeat, datasets.py:127-134).
        f0 = frames[0]
        feats = np.concatenate(
            [
                f0["elements"],
                f0["z_coord"][:, None],
                f0["dopplers"][:, None],
                10 * np.log10(f0["powers"][:, None] + 1e-8),
            ],
            axis=1,
        )[:, :4].astype(np.float32)
        np.testing.assert_allclose(out[0, :10], feats, rtol=1e-6)
        for row in out[0, 10:]:
            assert any(np.allclose(row, p, rtol=1e-6) for p in feats)

    def test_subsampled_frame_points_come_from_original(self):
        rng = np.random.default_rng(1)
        frames = [_frame(100, rng)]
        out = process_frames(frames, nmax=32, standardize_point_cloud=False)
        f = frames[0]
        feats = np.concatenate(
            [
                f["elements"],
                f["z_coord"][:, None],
                f["dopplers"][:, None],
                10 * np.log10(f["powers"][:, None] + 1e-8),
            ],
            axis=1,
        )[:, :4].astype(np.float32)
        for row in out[0]:
            assert any(np.allclose(row, p, rtol=1e-6) for p in feats)
        # without replacement → all distinct source rows
        assert len({tuple(r) for r in out[0]}) == 32

    def test_standardization_centers_each_cloud(self):
        rng = np.random.default_rng(2)
        frames = [_frame(50, rng), _frame(70, rng)]
        out = process_frames(frames, nmax=40, standardize_point_cloud=True)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)

    def test_nfeatures_truncation_drops_power(self):
        # With NFEATURES=4 the dB power column is computed then dropped
        # (datasets.py:119-124).
        rng = np.random.default_rng(3)
        frames = [_frame(40, rng)]
        # cardinality == nmax still subsamples-without-replacement → a
        # permutation of the original points; compare sorted columns.
        out = process_frames(frames, nmax=40, standardize_point_cloud=False)
        f = frames[0]
        np.testing.assert_allclose(
            np.sort(out[0, :, 3]), np.sort(f["dopplers"]), rtol=1e-6
        )

    def test_forced_subsampling_uses_first_k_points(self):
        # Quirk: indices drawn from range(force) (datasets.py:108-116).
        rng = np.random.default_rng(4)
        frames = [_frame(100, rng)]
        out = process_frames(
            frames, nmax=8, standardize_point_cloud=False, force_pc_subsampling=8
        )
        f = frames[0]
        first8 = np.concatenate(
            [
                f["elements"][:8],
                f["z_coord"][:8, None],
                f["dopplers"][:8, None],
            ],
            axis=1,
        ).astype(np.float32)
        for row in out[0]:
            assert any(np.allclose(row, p, rtol=1e-6) for p in first8)


class TestSplits:
    def test_counts_and_contract(self, generated_splits):
        gen, counts = generated_splits
        assert counts["train"] > 0 and counts["unseen"] > 0
        for split in SPLIT:
            files = os.listdir(os.path.join(gen, split.value))
            assert len(files) == counts[split.value]
            for f in files:
                crop, subj, scen, track = parse_crop_filename(f)
                if split is SPLIT.UNSEEN:
                    assert subj in (3, 4)
                else:
                    assert subj in (0, 1, 2)
                assert scen in {s.value for s in SCENARIO}

    def test_crop_files_have_expected_shape(self, generated_splits):
        gen, _ = generated_splits
        files = os.listdir(os.path.join(gen, "train"))
        arr = np.load(os.path.join(gen, "train", files[0]))
        assert arr.shape == (12, 64, 4)
        assert arr.dtype == np.float32

    def test_track_level_disjointness(self, generated_splits):
        # A (subject, scenario, track) triple must appear in exactly one of
        # train/valid/test (track-level split, datasets.py:269-276).
        gen, _ = generated_splits
        seen = {}
        for split in ("train", "valid", "test"):
            for f in os.listdir(os.path.join(gen, split)):
                _, subj, scen, track = parse_crop_filename(f)
                key = (subj, scen, track)
                assert seen.setdefault(key, split) == split


class TestRadarCropDataset:
    def test_contiguous_labels(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(SPLIT.TRAIN, gen)
        assert set(ds.labels.tolist()) == {0, 1, 2}
        assert ds.n_classes == 3

    def test_unseen_labels_remapped(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(SPLIT.UNSEEN, gen)
        assert set(ds.labels.tolist()) == {0, 1}
        assert sorted(set(ds.original_labels.tolist())) == [3, 4]

    def test_sequential_ordering(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(SPLIT.TEST, gen, sequential=True)
        prev = None
        for f in ds.filenames:
            crop, subj, scen, track = parse_crop_filename(f)
            key = (subj, scen, track)
            if prev is not None and key == prev[0]:
                assert crop == prev[1] + 1
            prev = (key, crop)

    def test_remap_follows_raw_listdir_encounter_order(self, monkeypatch):
        # The reference remaps via list(set(labels)) with labels in RAW
        # os.listdir order (never sorted, datasets.py:415,433-436). For ≤4
        # ids containing a colliding pair ({0,8} or {1,9} in the 8-slot
        # table) set iteration follows INSERTION order, so the remap must
        # replay raw-listing first encounters, not sorted-name order.
        assert list({1, 9}) == [1, 9] and list({9, 1}) == [9, 1]  # CPython

        names_9_first = [
            "crop0_subj9_free_walk_track0.npy",
            "crop0_subj1_free_walk_track0.npy",
            "crop1_subj9_free_walk_track0.npy",
        ]

        def fake_listdir(path):
            return list(names_9_first)

        monkeypatch.setattr("os.listdir", fake_listdir)
        ds = RadarCropDataset(SPLIT.UNSEEN, "/nonexistent")
        assert ds.class_map == {9: 0, 1: 1}
        # data order stays sorted regardless of listing order
        assert ds.filenames == sorted(names_9_first)

        names_1_first = [names_9_first[1], names_9_first[0], names_9_first[2]]
        monkeypatch.setattr("os.listdir", lambda path: list(names_1_first))
        ds2 = RadarCropDataset(SPLIT.UNSEEN, "/nonexistent")
        assert ds2.class_map == {1: 0, 9: 1}
        assert ds2.filenames == sorted(names_9_first)

    def test_sequential_remap_ignores_scenario_filter_for_encounter_order(
        self, monkeypatch
    ):
        # Sequential mode in the reference builds subject blocks from
        # track_dict over the UNFILTERED listing and only then filters by
        # scenario (datasets.py:394-417): a subject whose earliest raw crop
        # is in a filtered-out scenario KEEPS its early insertion slot.
        # Non-sequential mode takes labels from the filtered listing
        # (datasets.py:413-436), so there first-KEPT-encounter order rules.
        raw = [
            "crop0_subj1_smartphone_track0.npy",  # subj 1 first, filtered out
            "crop0_subj9_free_walk_track0.npy",
            "crop1_subj1_free_walk_track0.npy",  # subj 1's first KEPT crop
        ]
        monkeypatch.setattr("os.listdir", lambda path: list(raw))
        scen = [SCENARIO.FREE_WALK]

        seq = RadarCropDataset(
            SPLIT.UNSEEN, "/nonexistent", scenarios=scen, sequential=True
        )
        assert seq.class_map == {1: 0, 9: 1}  # unfiltered block order

        flat = RadarCropDataset(SPLIT.UNSEEN, "/nonexistent", scenarios=scen)
        assert flat.class_map == {9: 0, 1: 1}  # first-kept-encounter order

        # a subject with NO kept crops must not appear at all
        raw2 = raw[:2]
        monkeypatch.setattr("os.listdir", lambda path: list(raw2))
        seq2 = RadarCropDataset(
            SPLIT.UNSEEN, "/nonexistent", scenarios=scen, sequential=True
        )
        assert seq2.class_map == {9: 0}

    def test_scenario_filter(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(
            SPLIT.TRAIN, gen, scenarios=[SCENARIO.FREE_WALK]
        )
        for f in ds.filenames:
            assert parse_crop_filename(f)[2] == "free_walk"

    def test_load_all_shapes(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(SPLIT.TRAIN, gen)
        x, y = ds.load_all()
        assert x.shape == (len(ds), 12, 64, 4)
        assert x.dtype == np.float32 and y.dtype == np.int32

    def test_epoch_batch_indices(self, generated_splits):
        gen, _ = generated_splits
        ds = RadarCropDataset(SPLIT.TRAIN, gen)
        rng = np.random.default_rng(0)
        idx = epoch_batch_indices(len(ds), 4, shuffle=True, rng=rng)
        assert idx.shape[1] == 4
        assert idx.shape[0] == len(ds) // 4
        assert len(np.unique(idx)) == idx.size  # no repeats with drop_last
