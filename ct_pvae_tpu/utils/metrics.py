"""Structured metrics: jsonl + the reference's .npy/.png artifact contract.

The reference logs loss via prints and dumps ``train_loss_vec.npy`` etc. plus
matplotlib curves (main_ct_vae.py:409-422, helper_functions.py:371-380).  We
emit one jsonl record per step (machine-readable observability the reference
lacks) *and* keep the same .npy artifact names for parity tooling.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, save_path: Optional[str] = None):
        self.save_path = save_path
        self.history: Dict[str, List[float]] = {}
        self.iters: List[int] = []
        self._fh = None
        if save_path is not None:
            os.makedirs(save_path, exist_ok=True)
            self._fh = open(os.path.join(save_path, "metrics.jsonl"), "a")

    def log(self, step: int, **values: float) -> None:
        self.iters.append(step)
        for k, v in values.items():
            self.history.setdefault(k, []).append(float(v))
        if self._fh is not None:
            rec = {"step": step, "time": time.time()}
            rec.update({k: float(v) for k, v in values.items()})
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def save_npy_contract(self) -> None:
        """Write the reference's artifact names (main_ct_vae.py:411-414)."""
        if self.save_path is None:
            return
        mapping = {
            "loss": "train_loss_vec.npy",
            "kl": "train_loss_kl.npy",
            "loglik": "train_loss_loglik.npy",
        }
        for key, fname in mapping.items():
            if key in self.history:
                np.save(os.path.join(self.save_path, fname), np.asarray(self.history[key]))
        np.save(os.path.join(self.save_path, "iter_vec.npy"), np.asarray(self.iters))

    def save_plots(self) -> None:
        if self.save_path is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        titles = {
            "loss": ("Training loss", "train_loss_vec"),
            "kl": ("Training loss KL divergence", "train_loss_kl"),
            "loglik": ("Training loss loglikelihood", "train_loss_loglik"),
        }
        for key, (title, fname) in titles.items():
            if key in self.history:
                plt.figure()
                plt.title(title)
                plt.plot(self.history[key])
                plt.savefig(os.path.join(self.save_path, fname + ".png"))
                plt.close()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
