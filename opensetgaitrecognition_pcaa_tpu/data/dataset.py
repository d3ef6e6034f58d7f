"""Crop-file dataset: split dir → fixed-shape device-ready arrays.

Behavioral oracle: reference ``MSRadarDataset`` (``datasets.py:381-484``) —
lists a split's crop files, filters by scenario, remaps original subject ids
to contiguous labels, and (in sequential mode) orders crops by
(subject, track, crop index) for temporal-voting inference.

TPU-first difference: instead of a per-item ``__getitem__`` feeding a
single-threaded torch DataLoader (reference uses ``num_workers=0``
everywhere), the whole split is materialized **once** into a single
``(n, T, N, C)`` float32 array that lives on device for the entire
training run; batching is pure indexing inside jitted code. This removes
every per-batch host→device transfer and host sync from the hot loop.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO, SPLIT

_FNAME_RE = re.compile(r"crop(\d+)_subj(\d+)_(.+)_track(.+)\.npy")


def parse_crop_filename(fname: str) -> Tuple[int, int, str, str]:
    """→ (crop_index, subject, scenario, track_id).

    Filename contract: ``crop{i}_subj{j}_{scenario}_track{t}.npy``
    (reference ``datasets.py:62-76,304-313``).
    """
    m = _FNAME_RE.fullmatch(fname)
    if not m:
        raise ValueError(f"bad crop filename: {fname}")
    return int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)


class RadarCropDataset:
    """All crops of one split as host numpy arrays (load once, jit forever)."""

    def __init__(
        self,
        split: SPLIT,
        gen_data_path: str,
        scenarios: Sequence[SCENARIO] = tuple(SCENARIO),
        sequential: bool = False,
        subsample_factor: float = 1.0,
        subsample_rng: Optional[np.random.Generator] = None,
    ):
        self.split = split
        self.dataset_dir = os.path.join(gen_data_path, split.value)
        self.sequential = sequential

        # Raw (unsorted) listing kept separately: the label remap below must
        # reproduce the reference's set-insertion order, which is
        # first-encounter over this raw order. Data order itself is sorted
        # for determinism (documented deviation). Each name parses once.
        raw = [(f, parse_crop_filename(f)) for f in os.listdir(self.dataset_dir)]
        scen_values = {s.value for s in scenarios}
        parsed = sorted((fp for fp in raw if fp[1][2] in scen_values))

        if sequential:
            # Order by (subject, scenario, track, crop index) so consecutive
            # items are consecutive time windows of one physical walk.
            # Deviation from the reference (``datasets.py:394-413``): its
            # ``get_sorted_seq`` keys tracks by id only, interleaving
            # same-named tracks from different scenarios within one "sequence"
            # — windows from different walks end up in one voting batch. We
            # keep each walk contiguous; labels per batch are unchanged.
            parsed.sort(key=lambda p: (p[1][1], p[1][2], p[1][3], p[1][0]))

        if subsample_factor < 1.0:
            rng = subsample_rng or np.random.default_rng(0)
            keep = rng.choice(
                len(parsed), int(len(parsed) * subsample_factor), replace=False
            )
            if sequential:
                keep = np.sort(keep)
            parsed = [parsed[i] for i in keep]

        self.filenames: List[str] = [f for f, _ in parsed]
        self.original_labels = np.array([p[1] for _, p in parsed], dtype=np.int32)
        self.tracks = [p[3] for _, p in parsed]

        # Remap original subject ids to contiguous 0..n-1 labels, reproducing
        # the reference's *set-iteration* order (``datasets.py:434-464``:
        # ``list(set(labels))``). CPython int sets iterate by hash-table slot
        # (identity hash mod table size) — NOT sorted once ids ≥ 8 wrap: e.g.
        # {4, 6, 8, 9} iterates as [8, 9, 4, 6]. Int hashing is not
        # randomized, so this is deterministic across processes. The subject
        # picked for threshold validation at inference is an index into THIS
        # order, so the previously-used sorted remap silently excluded a
        # DIFFERENT physical unseen subject than the reference whenever a
        # subject id ≥ 8 was unseen (measured in round 3's shared-weights
        # decision parity: ~300 of ~1100 decision crops differed per side
        # before this fix).
        #
        # Insertion order matters too, in one regime: sets of ≤ 4 ints keep
        # the initial 8-slot table, so the colliding pairs {0, 8} and {1, 9}
        # iterate in INSERTION order (list({1, 9}) == [1, 9] but
        # list({9, 1}) == [9, 1]); 5+ element sets resize to 32 slots where
        # ids 0-9 never collide. The reference inserts labels in
        # first-encounter order over its raw ``os.listdir`` (its filenames
        # are never sorted, ``datasets.py:415,433-436``) — but the two modes
        # encounter subjects differently:
        #
        # - non-sequential: labels come from the scenario-FILTERED listing
        #   (``datasets.py:413-436``), so first encounter is over the raw
        #   order restricted to kept files;
        # - sequential: subject BLOCKS are built from ``track_dict`` over the
        #   UNFILTERED listing and only then scenario-filtered
        #   (``datasets.py:394-417``), so a subject whose earliest raw crop
        #   is filtered out still keeps its early block position (as long as
        #   any of its crops survives) — first encounter is over the raw
        #   order restricted only to subjects with ≥ 1 kept file.
        #
        # Replaying the right variant is exact on any filesystem the two
        # sides share. Affects ablation configs with 2- or 4-subject label
        # sets containing 0&8 or 1&9 (scenario-restricted sequential evals
        # would otherwise flip the colliding pair's order).
        kept = {f for f, _ in parsed}
        kept_subjects = {p[1] for f, p in raw if f in kept}
        if sequential:
            encounter = (p[1] for _, p in raw)
        else:
            encounter = (p[1] for f, p in raw if f in kept)
        classes = list({s for s in encounter if s in kept_subjects})
        self.class_map = {c: i for i, c in enumerate(classes)}
        self.labels = np.array(
            [self.class_map[c] for c in self.original_labels], dtype=np.int32
        )
        self.n_classes = len(classes)

        self._arrays: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.filenames)

    def load_all(self) -> Tuple[np.ndarray, np.ndarray]:
        """→ (``(n, T, N, C)`` float32, ``(n,)`` int32). Cached after first call."""
        if self._arrays is None:
            if not self.filenames:
                raise ValueError(f"empty split dir: {self.dataset_dir}")
            first = np.load(os.path.join(self.dataset_dir, self.filenames[0]))
            out = np.empty((len(self.filenames),) + first.shape, dtype=np.float32)
            out[0] = first
            for i, f in enumerate(self.filenames[1:], start=1):
                out[i] = np.load(os.path.join(self.dataset_dir, f))
            self._arrays = out
        return self._arrays, self.labels

def epoch_batch_indices(
    n: int,
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = True,
) -> np.ndarray:
    """Index matrix ``(steps, batch_size)`` for one epoch over ``n`` samples.

    Shuffling happens host-side (cheap); the gather happens on device inside
    the jitted epoch. ``drop_last=True`` matches every reference training
    loader (e.g. ``PCAA_ablation.py:797``). ``rng.shuffle`` over ``arange``
    consumes the Generator stream identically to ``rng.permutation(n)``, so
    resume checkpoints that replay the host RNG state stay schedule-exact.
    """
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng(0)).shuffle(order)
    steps = n // batch_size if drop_last else -(-n // batch_size)
    if not drop_last and steps * batch_size > n:
        pad = steps * batch_size - n
        order = np.concatenate([order, order[:pad]])
    return order[: steps * batch_size].reshape(steps, batch_size)
