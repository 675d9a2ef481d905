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


def test_rbf_surrogate_interpolates_and_generalizes():
    from ct_pvae_tpu.hpo import RBFSurrogate

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * x[:, 0]) + (x[:, 1] - 0.4) ** 2
    s = RBFSurrogate(x, y)
    # interpolation at the data points
    np.testing.assert_allclose(s.predict(x), y, atol=1e-6)
    # generalization at held-out points
    xt = rng.uniform(0.1, 0.9, (100, 2))
    yt = np.sin(3 * xt[:, 0]) + (xt[:, 1] - 0.4) ** 2
    err = np.abs(s.predict(xt) - yt)
    assert err.mean() < 0.05, err.mean()


def test_surrogate_beats_random_at_equal_budget():
    """VERDICT round-1 next-round #7: the RBF loop must outperform random
    sampling on a synthetic objective at the same trial budget (best-found
    value, averaged over repeats)."""
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.hpo import SearchSpace, sweep

    space = SearchSpace(params={"a": (-2.0, 2.0), "b": (-2.0, 2.0)})

    def objective(ov):
        # smooth multimodal bowl: Branin-like, minimum well inside the box
        a, b = ov["a"], ov["b"]
        return (a - 0.7) ** 2 + (b + 0.3) ** 2 + 0.3 * np.sin(5 * a) ** 2

    base = Config()
    budget = 20
    best_sur, best_rand = [], []
    for seed in range(5):
        rs = sweep(base, space, num_trials=budget, mode="surrogate",
                   seed=seed, objective=objective)
        rr = sweep(base, space, num_trials=budget, mode="random",
                   seed=seed, objective=objective)
        best_sur.append(rs[0][2])
        best_rand.append(rr[0][2])
    assert len(rs) == budget and len(rr) == budget
    assert np.mean(best_sur) < np.mean(best_rand), (best_sur, best_rand)
    # and the surrogate should land near the true optimum on average
    assert np.mean(best_sur) < 0.05, best_sur


def test_surrogate_robust_to_diverged_trials():
    """Round-5 fix for the r4 HPO finding: diverged trials return huge FINITE
    losses (the NaN-guard pins ~4.7e6 against a ~600 objective), which used to
    be fed raw into the cubic RBF and destroy the fit.  With the median+10*IQR
    cap the surrogate must still find the optimum of an objective whose space
    contains a divergence region."""
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.hpo import SearchSpace, sweep

    space = SearchSpace(params={"a": (-2.0, 2.0), "b": (-2.0, 2.0)})

    def objective(ov):
        a, b = ov["a"], ov["b"]
        if a > 1.2:  # "divergence" band: NaN-guarded trainer-style huge loss
            return 4.69e6
        return 600.0 + (a - 0.5) ** 2 + (b + 0.3) ** 2

    base = Config()
    best = []
    for seed in range(5):
        rs = sweep(base, space, num_trials=20, mode="surrogate",
                   seed=seed, objective=objective)
        best.append(rs[0][2])
    # near-optimal despite the poisoned region (optimum = 600.0)
    assert np.mean(best) < 600.05, best


def test_sweep_resume_reuses_recorded_trials(tmp_path):
    """--resume replays recorded trials (random) / warm-starts the fit
    (surrogate) instead of re-running them."""
    import json
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.hpo import SearchSpace, sweep

    space = SearchSpace(params={"a": (-2.0, 2.0), "b": (-2.0, 2.0)})
    calls = []

    def objective(ov):
        calls.append(dict(ov))
        return (ov["a"] - 0.5) ** 2 + (ov["b"] + 0.3) ** 2

    base = Config()
    root = str(tmp_path / "arm")
    r1 = sweep(base, space, num_trials=6, mode="random", seed=3,
               save_root=root, objective=objective)
    assert len(calls) == 6
    calls.clear()
    r2 = sweep(base, space, num_trials=10, mode="random", seed=3,
               save_root=root, objective=objective, resume=True)
    assert len(calls) == 4            # only the NEW trials ran
    assert len(r2) == 10
    # the recorded six are present verbatim (same (idx, loss) pairs)
    got = {(i, round(l, 12)) for i, _, l in r2}
    for i, _, l in r1:
        assert (i, round(l, 12)) in got

    # surrogate warm start: skips the latin-hypercube init entirely
    calls.clear()
    r3 = sweep(base, space, num_trials=12, mode="surrogate", seed=3,
               save_root=root, objective=objective, resume=True)
    assert len(calls) == 2            # 12 - 10 recorded
    assert len(r3) == 12


def test_sweep_resume_rejects_mismatched_record(tmp_path):
    """Replaying a record produced under a different seed must fail loudly."""
    import pytest as _pytest
    from ct_pvae_tpu.config import Config
    from ct_pvae_tpu.hpo import SearchSpace, sweep

    space = SearchSpace(params={"a": (-2.0, 2.0)})
    obj = lambda ov: ov["a"] ** 2
    root = str(tmp_path / "arm")
    sweep(Config(), space, num_trials=3, mode="random", seed=1,
          save_root=root, objective=obj)
    with _pytest.raises(ValueError, match="resume"):
        sweep(Config(), space, num_trials=5, mode="random", seed=2,
              save_root=root, objective=obj, resume=True)
