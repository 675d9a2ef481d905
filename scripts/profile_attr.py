"""Conv-cost attribution: FLOP-bound vs launch/layout-bound.

Runs only the architecture-attribution variants (see profile_scan.py for the
full sweep).  If il=0 (12 fewer convs) saves ~proportionally to conv count
while ks=2 (4x fewer conv FLOPs) saves little, the step is bound by per-conv
overhead, not FLOPs — and vice versa.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_scan import build, time_loop  # noqa: E402
from ct_pvae_tpu.data.sinogram import images_to_sinograms  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, size=(20, 128, 128)).astype(np.float32)
    theta = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
    sinos = images_to_sinograms(imgs, theta, pad=True, batch=20)

    for name, kw in [
        ("paper baseline", {}),
        ("il=0 (no intermediate convs)", {"intermediate_layers": 0}),
        ("ks=2, ik=2 (2x2 kernels)", {"kernel_size": 2, "intermediate_kernel": 2}),
        ("nfm=40 (2x channels)", {"num_feature_maps": 40}),
        ("b=40 (4x batch)", {"batch_size": 40}),
    ]:
        tr = build(kw, sinos, theta)
        t = time_loop(tr)
        print(f"{name:32s} {t*1e3:7.2f} ms/step  {1/t:6.1f} steps/s")


if __name__ == "__main__":
    main()
