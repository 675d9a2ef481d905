"""SearchSpace mechanics (sampling bounds, grid, integer handling)."""

import numpy as np

from ct_pvae_tpu.hpo import SearchSpace


def test_random_sampling_respects_bounds_and_integers():
    space = SearchSpace(
        params={"learning_rate": (1e-5, 1e-3), "num_blocks": (2, 4), "algo": ["a", "b"]},
        integer=("num_blocks",),
    )
    rng = np.random.default_rng(0)
    for _ in range(50):
        s = space.sample(rng)
        assert 1e-5 <= s["learning_rate"] <= 1e-3
        assert isinstance(s["num_blocks"], int) and 2 <= s["num_blocks"] <= 4
        assert s["algo"] in ("a", "b")


def test_grid_covers_corners():
    space = SearchSpace(params={"x": (0.0, 1.0), "n": (1, 3)}, integer=("n",))
    grid = space.grid(points_per_dim=3)
    xs = sorted({g["x"] for g in grid})
    ns = sorted({g["n"] for g in grid})
    assert xs == [0.0, 0.5, 1.0]
    assert ns == [1, 2, 3]
    assert len(grid) == 9
