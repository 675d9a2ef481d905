"""Hyperparameter search / trial orchestration (reference layer L7).

The reference delegates HPO to the external ``hpo-uq`` package: YAML configs
with a ``prms:`` search space, an RBF surrogate, and an MPI/NCCL *trial farm*
over Slurm (SURVEY.md §2.2, configs/*.yaml) — the collective backends move
trial assignments, not tensors.  Here trials are plain config sweeps:

  * search space: per-parameter (low, high) bounds or explicit choices,
    mirroring the reference's ``prms`` block (config_cpu.yaml:18-31)
  * samplers: grid, random, and a true RBF-surrogate loop (cubic RBF with a
    linear polynomial tail + stochastic-response-surface candidate
    acquisition — the algorithm family hpo-uq's ``hpo: surrogate: rbf``
    configures, config_cpu.yaml:32-35)
  * objective: ``vi.train.run`` -> loss_final_mean, exactly the value the
    reference's trainer returns to hpo-uq (main_ct_vae.py:733-735)
  * distribution: one process per trial via multiprocessing, or rank-sliced
    when launched under a multi-host scheduler (RANK/WORLD_SIZE env) — the
    TPU-native replacement for the MPI/NCCL trial farm
"""

from __future__ import annotations

import itertools
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .config import Config

ParamSpec = Union[Tuple[float, float], Sequence[Any]]


@dataclass
class SearchSpace:
    """Parameter ranges: {name: (low, high)} continuous / int, or a choice list."""

    params: Dict[str, ParamSpec]
    integer: Sequence[str] = field(default_factory=tuple)

    def sample(self, rng: np.random.Generator) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, spec in self.params.items():
            if isinstance(spec, tuple) and len(spec) == 2 and all(
                isinstance(v, (int, float)) for v in spec
            ):
                v = rng.uniform(spec[0], spec[1])
                out[name] = int(round(v)) if name in self.integer else float(v)
            else:
                out[name] = spec[int(rng.integers(len(spec)))]
        return out

    def grid(self, points_per_dim: int = 3) -> List[Dict[str, Any]]:
        axes = []
        for name, spec in self.params.items():
            if isinstance(spec, tuple) and len(spec) == 2 and all(
                isinstance(v, (int, float)) for v in spec
            ):
                vals = np.linspace(spec[0], spec[1], points_per_dim)
                if name in self.integer:
                    vals = sorted(set(int(round(v)) for v in vals))
                axes.append([(name, v) for v in vals])
            else:
                axes.append([(name, v) for v in spec])
        return [dict(combo) for combo in itertools.product(*axes)]


# ---------------------------------------------------------------------------
# RBF surrogate (the hpo-uq 'surrogate: rbf' capability, done for real)
# ---------------------------------------------------------------------------


class RBFSurrogate:
    """Cubic RBF interpolant with a linear polynomial tail.

    s(x) = sum_i lam_i * ||x - x_i||^3 + c0 + c^T x, fit by solving the
    standard saddle system [[Phi, P], [P^T, 0]] — the interpolant used by
    RBF surrogate optimizers (Gutmann 2001 / Regis & Shoemaker SRBF, the
    method class behind hpo-uq's RBF mode).  Inputs are expected in the unit
    cube; targets are rank-robustified by the caller if desired.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray):
        x = np.atleast_2d(np.asarray(x, np.float64))
        y = np.asarray(y, np.float64)
        n, d = x.shape
        r = np.linalg.norm(x[:, None] - x[None], axis=-1)
        phi = r ** 3
        p = np.hstack([np.ones((n, 1)), x])
        a = np.block([[phi, p], [p.T, np.zeros((d + 1, d + 1))]])
        a[np.diag_indices(n)] += 1e-10  # jitter for duplicate points
        rhs = np.concatenate([y, np.zeros(d + 1)])
        sol = np.linalg.lstsq(a, rhs, rcond=None)[0]
        self._x = x
        self._lam = sol[:n]
        self._c = sol[n:]

    def predict(self, z: np.ndarray) -> np.ndarray:
        z = np.atleast_2d(np.asarray(z, np.float64))
        r = np.linalg.norm(z[:, None] - self._x[None], axis=-1)
        return (r ** 3) @ self._lam + np.hstack([np.ones((len(z), 1)), z]) @ self._c


# SRBF weight cycle: low weight on the surrogate value = explore, high =
# exploit (Regis & Shoemaker 2007)
_SRBF_WEIGHTS = (0.3, 0.5, 0.8, 0.95)


def _srbf_propose(
    surrogate: RBFSurrogate,
    evaluated: np.ndarray,       # (n, d) unit-cube points already run
    best: np.ndarray,            # (d,) incumbent
    rng: np.random.Generator,
    n_batch: int,
    cycle_start: int,
) -> np.ndarray:
    """Pick ``n_batch`` unit-cube candidates by weighted (value, distance) rank."""
    d = evaluated.shape[1]
    n_cand = max(200, 50 * d)
    # half global uniform, half Gaussian perturbations of the incumbent
    cand = np.vstack([
        rng.uniform(0, 1, size=(n_cand // 2, d)),
        np.clip(best + rng.normal(0, 0.1, size=(n_cand - n_cand // 2, d)), 0, 1),
    ])
    pred = surrogate.predict(cand)
    dmin = np.linalg.norm(cand[:, None] - evaluated[None], axis=-1).min(axis=1)

    def norm01(v):
        lo, hi = v.min(), v.max()
        return np.zeros_like(v) if hi <= lo else (v - lo) / (hi - lo)

    vn = norm01(pred)          # low = promising
    dn = norm01(-dmin)         # low = far from evaluated points
    picks = []
    taken = np.zeros(len(cand), bool)
    for b in range(n_batch):
        w = _SRBF_WEIGHTS[(cycle_start + b) % len(_SRBF_WEIGHTS)]
        score = w * vn + (1.0 - w) * dn
        score = np.where(taken, np.inf, score)
        i = int(np.argmin(score))
        taken[i] = True
        picks.append(cand[i])
    return np.asarray(picks)


class _SpaceCodec:
    """Map override dicts <-> unit-cube vectors over the numeric (low, high)
    dimensions; choice dimensions ride along from the incumbent."""

    def __init__(self, space: SearchSpace):
        self.space = space
        self.numeric = [
            (name, spec)
            for name, spec in space.params.items()
            if isinstance(spec, tuple) and len(spec) == 2
            and all(isinstance(v, (int, float)) for v in spec)
        ]

    @property
    def dim(self) -> int:
        return len(self.numeric)

    def encode(self, overrides: Dict[str, Any]) -> np.ndarray:
        out = np.empty(self.dim)
        for j, (name, (lo, hi)) in enumerate(self.numeric):
            out[j] = 0.5 if hi <= lo else (float(overrides[name]) - lo) / (hi - lo)
        return out

    def decode(self, u: np.ndarray, template: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(template)  # choice params inherited from the incumbent
        for j, (name, (lo, hi)) in enumerate(self.numeric):
            v = lo + float(np.clip(u[j], 0, 1)) * (hi - lo)
            out[name] = int(round(v)) if name in self.space.integer else float(v)
        return out


def _run_trial(args) -> Tuple[int, Dict[str, Any], float]:
    idx, base_dict, overrides, save_root = args
    from .vi.train import run

    cfg = Config.from_dict(base_dict).replace(**overrides)
    if save_root:
        cfg = cfg.replace(save_path=os.path.join(save_root, f"trial_{idx:04d}"))
    try:
        loss = run(cfg)
    except Exception as e:  # a diverged trial is a bad objective, not a crash
        print(f"trial {idx} failed: {e}")
        loss = float("inf")
    return idx, overrides, float(loss)


def sweep(
    base: Config,
    space: SearchSpace,
    num_trials: int = 8,
    mode: str = "random",       # 'random' | 'grid' | 'surrogate'
    seed: int = 0,
    save_root: Optional[str] = None,
    processes: int = 1,
    objective=None,             # optional {overrides} -> loss (tests/studies)
    resume: bool = False,
) -> List[Tuple[int, Dict[str, Any], float]]:
    """Run trials; returns [(idx, overrides, loss_final_mean)] sorted by loss.

    Rank slicing: if RANK/WORLD_SIZE are set, this process runs trials
    ``idx % WORLD_SIZE == RANK`` (launch one process per host/chip-group for
    the trial-farm pattern).  Surrogate mode is single-controller (the RBF
    refit is sequential); its per-round proposal batches still fan out over
    ``processes``.

    ``resume``: reuse completed trials from ``save_root/sweep_results.json``
    instead of re-running them — random/grid replay recorded losses for the
    seed's first candidates (the rng stream stays aligned); surrogate treats
    every recorded (point, loss) as evaluated data and goes straight to
    fit-propose rounds (a warm start from ANY prior trial set).
    """
    rng = np.random.default_rng(seed)
    prior: List[Tuple[int, Dict[str, Any], float]] = []
    if resume and save_root:
        path = os.path.join(save_root, "sweep_results.json")
        if os.path.exists(path):
            with open(path) as f:
                prior = [
                    (d["trial"], d["overrides"], float(d["loss_final_mean"]))
                    for d in json.load(f)
                ]
            prior.sort(key=lambda r: r[0])
            prior = prior[:num_trials]
    if mode == "surrogate":
        results = _surrogate_loop(
            base, space, num_trials, rng, save_root, processes, objective,
            prior=prior,
        )
    else:
        if mode == "grid":
            candidates = space.grid()[:num_trials]
        else:
            candidates = [space.sample(rng) for _ in range(num_trials)]
        # a recorded loss may only be replayed for the candidate that produced
        # it — a resume with a different seed/mode (or a rank-sliced record)
        # would silently mis-attribute losses otherwise
        for (idx, ov, _), cand in zip(prior, candidates):
            ok = set(ov) == set(cand) and all(
                abs(float(ov[k]) - float(cand[k]))
                <= 1e-9 * max(1.0, abs(float(cand[k])))
                if isinstance(cand[k], (int, float))
                else ov[k] == cand[k]
                for k in cand
            )
            if not ok:
                raise ValueError(
                    f"resume: recorded trial {idx} does not match this "
                    f"seed/mode's candidate stream — the recorded sweep used "
                    f"different settings ({ov} vs {cand})"
                )
        results = prior + _run_all(
            base, candidates[len(prior):], save_root, processes, len(prior),
            objective,
        )

    results.sort(key=lambda r: r[2])
    if save_root:
        os.makedirs(save_root, exist_ok=True)
        with open(os.path.join(save_root, "sweep_results.json"), "w") as f:
            json.dump([
                {"trial": i, "overrides": o, "loss_final_mean": l} for i, o, l in results
            ], f, indent=2)
    return results


def _surrogate_loop(
    base, space, num_trials, rng, save_root, processes, objective, prior=None
) -> List[Tuple[int, Dict[str, Any], float]]:
    """RBF surrogate optimization: space-filling init, then fit-propose-run
    rounds of ``processes`` candidates via SRBF weighted-rank acquisition."""
    codec = _SpaceCodec(space)
    d = codec.dim
    if d == 0:  # pure-choice space: surrogate degenerates to random
        cands = [space.sample(rng) for _ in range(num_trials)]
        return _run_all(base, cands, save_root, processes, 0, objective)

    if prior:
        # warm start: recorded trials ARE the evaluated set; skip the
        # space-filling phase and go straight to fit-propose rounds
        results = list(prior)
    else:
        n_init = min(num_trials, max(d + 2, num_trials // 3))
        # stratified (latin-hypercube) init in the unit cube
        u = (rng.permuted(np.tile(np.arange(n_init), (d, 1)), axis=1).T + rng.uniform(0, 1, (n_init, d))) / n_init
        template = space.sample(rng)
        init = [codec.decode(u[i], template) for i in range(n_init)]
        results = _run_all(base, init, save_root, processes, 0, objective)

    evaluated = [codec.encode(o) for _, o, _ in results]
    losses = [l for _, _, l in results]
    cycle = 0
    while len(results) < num_trials:
        finite = np.isfinite(losses)
        y = np.asarray(losses, np.float64)
        # inf-safe: failed trials pinned above the worst finite value
        worst = y[finite].max() if finite.any() else 0.0
        y = np.where(finite, y, worst + 1.0)
        # Diverged-but-finite trials (NaN-guarded runs return huge losses,
        # e.g. 4.7e6 against a ~600 objective) wreck a cubic RBF interpolant
        # fitted on raw values; cap at median + 10*IQR (the Gutmann-style
        # large-value replacement) so the surrogate models the good region
        # and merely marks the diverged points as bad.
        if finite.sum() >= 4:
            q1, med, q3 = np.percentile(y[finite], [25, 50, 75])
            y = np.minimum(y, med + 10.0 * max(q3 - q1, 1e-9))
        surrogate = RBFSurrogate(np.asarray(evaluated), y)
        best_idx = int(np.argmin(y))
        n_batch = min(max(1, processes), num_trials - len(results))
        picks = _srbf_propose(
            surrogate, np.asarray(evaluated), evaluated[best_idx], rng, n_batch, cycle
        )
        cycle += n_batch
        incumbent = results[best_idx][1]
        cands = [codec.decode(p, incumbent) for p in picks]
        batch = _run_all(base, cands, save_root, processes, len(results), objective)
        results += batch
        evaluated += [codec.encode(o) for _, o, _ in batch]
        losses += [l for _, _, l in batch]
    return results


def _run_all(base, candidates, save_root, processes, offset, objective=None) -> List:
    if objective is not None:
        return [
            (offset + i, ov, float(objective(ov))) for i, ov in enumerate(candidates)
        ]
    rank = int(os.environ.get("RANK", "0"))
    world = int(os.environ.get("WORLD_SIZE", "1"))
    jobs = [
        (offset + i, base.to_dict(), ov, save_root)
        for i, ov in enumerate(candidates)
        if (offset + i) % world == rank
    ]
    if processes > 1:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(processes) as pool:
            return list(pool.map(_run_trial, jobs))
    return [_run_trial(j) for j in jobs]
