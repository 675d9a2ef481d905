"""Host-side index streams replacing the reference's tf.data pipelines.

The reference zips four tensor datasets, shuffles, batches with
drop_remainder, prefetches and repeats (helper_functions.py:58-109), plus an
independent shuffled angle-index stream (:104-107).  TPU-natively the arrays
live on device once; per step we only need *indices*.  ``IndexStream``
reproduces shuffle-repeat-batch(drop_remainder) semantics with an explicit
seed.
"""

from __future__ import annotations

import numpy as np


class IndexStream:
    """Infinite shuffled batches of ``arange(n)`` with drop_remainder."""

    def __init__(self, n: int, batch: int, seed: int = 0, shuffle: bool = True):
        if batch > n:
            raise ValueError(f"batch {batch} > population {n}")
        self.n = n
        self.batch = batch
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(n)
        self._pos = n  # trigger reshuffle on first call

    def next(self) -> np.ndarray:
        if self._pos + self.batch > self.n:
            if self.shuffle:
                self._order = self._rng.permutation(self.n)
            self._pos = 0
        out = self._order[self._pos : self._pos + self.batch]
        self._pos += self.batch
        return out.astype(np.int32)

    def skip(self, k: int) -> None:
        """Advance past ``k`` draws (replaying the RNG, not copying batches).

        Elastic resume: a restored run fast-forwards its streams over the
        prefix a prior launch consumed, so the continued training sees the
        same index sequence an uninterrupted run would have.
        """
        for _ in range(k):
            if self._pos + self.batch > self.n:
                if self.shuffle:
                    self._order = self._rng.permutation(self.n)
                self._pos = 0
            self._pos += self.batch
