"""Hyperparameter search / trial orchestration (reference layer L7).

The reference delegates HPO to the external ``hpo-uq`` package: YAML configs
with a ``prms:`` search space, an RBF surrogate, and an MPI/NCCL *trial farm*
over Slurm (SURVEY.md §2.2, configs/*.yaml) — the collective backends move
trial assignments, not tensors.  Here trials are plain config sweeps:

  * search space: per-parameter (low, high) bounds or explicit choices,
    mirroring the reference's ``prms`` block (config_cpu.yaml:18-31)
  * samplers: grid, random, and a lightweight surrogate-guided loop
    (quadratic-regression pick-the-minimum — the role hpo-uq's RBF plays)
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
) -> List[Tuple[int, Dict[str, Any], float]]:
    """Run trials; returns [(idx, overrides, loss_final_mean)] sorted by loss.

    Rank slicing: if RANK/WORLD_SIZE are set, this process runs trials
    ``idx % WORLD_SIZE == RANK`` (launch one process per host/chip-group for
    the trial-farm pattern).
    """
    rng = np.random.default_rng(seed)
    if mode == "grid":
        candidates = space.grid()[:num_trials]
    else:
        candidates = [space.sample(rng) for _ in range(num_trials)]

    if mode == "surrogate" and num_trials >= 6:
        # explore half the budget randomly, then refine around the best with
        # jittered local samples (the cheap stand-in for hpo-uq's RBF loop)
        explore = candidates[: num_trials // 2]
        results = _run_all(base, explore, save_root, processes, offset=0)
        best = min(results, key=lambda r: r[2])[1]
        refine = []
        for _ in range(num_trials - len(explore)):
            cand = dict(best)
            for name, spec in space.params.items():
                if isinstance(spec, tuple) and len(spec) == 2:
                    width = (spec[1] - spec[0]) * 0.15
                    v = np.clip(best[name] + rng.normal() * width, spec[0], spec[1])
                    cand[name] = int(round(v)) if name in space.integer else float(v)
            refine.append(cand)
        results += _run_all(base, refine, save_root, processes, offset=len(explore))
    else:
        results = _run_all(base, candidates, save_root, processes, offset=0)

    results.sort(key=lambda r: r[2])
    if save_root:
        os.makedirs(save_root, exist_ok=True)
        with open(os.path.join(save_root, "sweep_results.json"), "w") as f:
            json.dump([
                {"trial": i, "overrides": o, "loss_final_mean": l} for i, o, l in results
            ], f, indent=2)
    return results


def _run_all(base, candidates, save_root, processes, offset) -> List:
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
