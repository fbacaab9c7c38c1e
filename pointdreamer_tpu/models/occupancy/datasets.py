"""Occupancy-training datasets.

Reference: models/POCO/datasets/shapenet.py (:9-216): per-shape npy files
(`pc_kaolin/<id>.npy` surface points, `points/<id>.npz` occupancy query
samples), split lists under `splits/*.txt`, test split shuffled with seed
3407 (:33).  Plus the synthetic sphere generator used by tests
(train.synthetic_occupancy_batch).

TPU shape discipline: every item is resampled to fixed sizes
(n_points/n_queries) so batches jit once.
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


class ShapeNetOccupancy:
    """Loads the POCO ShapeNet data layout."""

    def __init__(self, root: str, split: str = "training",
                 n_points: int = 3000, n_queries: int = 2048,
                 categories: Optional[List[str]] = None, seed: int = 3407):
        self.root = root
        self.n_points = n_points
        self.n_queries = n_queries
        split_file = os.path.join(root, "splits", f"{split}.txt")
        if os.path.exists(split_file):
            with open(split_file) as f:
                items = [l.strip() for l in f if l.strip()]
        else:  # directory scan fallback
            items = sorted(
                os.path.splitext(f)[0]
                for f in os.listdir(os.path.join(root, "pc"))
            ) if os.path.isdir(os.path.join(root, "pc")) else []
        if categories:
            items = [i for i in items
                     if any(i.startswith(c) for c in categories)]
        if split == "test":
            rng = np.random.default_rng(seed)  # reference shapenet.py:33
            rng.shuffle(items)
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i: int):
        name = self.items[i]
        pts = np.load(os.path.join(self.root, "pc", name + ".npy"))
        qz = np.load(os.path.join(self.root, "points", name + ".npz"))
        queries = qz["points"].astype(np.float32)
        occ = np.unpackbits(qz["occupancies"])[: len(queries)] \
            if qz["occupancies"].dtype == np.uint8 else qz["occupancies"]
        rng = np.random.default_rng(i)
        pi = rng.choice(len(pts), self.n_points,
                        replace=len(pts) < self.n_points)
        qi = rng.choice(len(queries), self.n_queries,
                        replace=len(queries) < self.n_queries)
        return (pts[pi, :3].astype(np.float32),
                queries[qi], occ[qi].astype(np.int32))

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0) -> Iterator[Tuple[np.ndarray, ...]]:
        rng = np.random.default_rng(seed)
        order = np.arange(len(self))
        while True:
            if shuffle:
                rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[int(j)] for j in order[s:s + batch_size]]
                yield tuple(np.stack(x) for x in zip(*items))
