"""Single typed configuration for the whole framework.

The reference threads 38 argparse flags plus ``**kwargs`` through every method,
re-declaring defaults in six different signatures (see reference
ctvae/main_ct_vae.py:30-116 and SURVEY.md §5.6).  Here there is exactly one
config object: a frozen dataclass, YAML-loadable and CLI-overridable.  Field
names and defaults intentionally match the reference flags (dest names) so a
reference user can port a command line one-to-one.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass(frozen=True)
class Config:
    # --- paths / modes (ref main_ct_vae.py:51-52, 85-88, 95-115) ---
    input_path: Optional[str] = None          # folder with training data
    save_path: Optional[str] = None           # folder for run artifacts
    train: bool = False                       # --train
    visualize: bool = False                   # --visualize
    pixel_dist: bool = False                  # --pixel_dist
    # posterior-histogram scale (ref main_ct_vae.py:648: 10000 repeats x 100
    # draws per repeat)
    pixel_dist_repeats: int = 10000           # --num_repeats
    pixel_dist_samples_1: int = 100           # --ns1
    no_final_eval: bool = False               # --no_final_eval
    real_data: bool = False                   # --real
    restore: bool = False                     # --restore
    restore_num: Optional[int] = None         # -r
    use_latest_ckpt: bool = False             # --ulc
    # Kill/resume recovery semantics: num_iter counts TOTAL iterations
    # including the restored ones, and the relaunched loop replays the exact
    # key/index sequence of an uninterrupted run (vi/train.py).  Default
    # False keeps the "+num_iter extra" extension semantics.
    resume_total: bool = False                # --resume_total

    # --- data / measurement model (ref main_ct_vae.py:71-84, 93-94, 107-112) ---
    truncate_dataset: int = 100               # --td
    num_sparse_angles: int = 10               # --nsa
    angles_per_iter: int = 5                  # --api (stochastic angle subsampling)
    poisson_noise_multiplier: float = (2**16 - 1) * 0.41   # --pnm
    pnm_start: Optional[float] = None         # --pnm_start (anneals to pnm)
    train_pnm: bool = False                   # --train_pnm
    random_angles: bool = False               # --random (random vs uniform masks)
    toy_masks: bool = False                   # --toy_masks
    no_pad: bool = False                      # --no_pad
    algorithms: List[str] = field(default_factory=lambda: ["gridrec"])  # --algorithms
    # Random-roll angle augmentation: the reference ships this disabled and
    # flagged "XXX check correct" (helper_functions.py:85-92); here it is
    # implemented correctly (vi/augment.py) and opt-in.
    roll_augment: bool = False                # --roll
    # Reuse cached masks/measurements/recon-stack from save_path even when
    # training (content-checked by shape; SURVEY.md §5.4 build note).  The
    # reference only reloads these when train=False.
    reuse_cache: bool = False                 # --reuse_cache
    # Serving-only cheap-init mode: substitute the iterative init algorithms
    # (sirt/tv, ~90 projector applications each batch) with the one-shot
    # ramp-FBP while PRESERVING channel count and order, so a model trained
    # on the 5-channel stack still gets 5 channels.  Trades init fidelity for
    # serving latency; fidelity cost measured in BENCH.md serving table.
    cheap_init: bool = False                  # infer --cheap_init

    # --- model architecture (ref main_ct_vae.py:47-50, 57-66, 89-90) ---
    num_blocks: int = 3                       # --nb
    num_feature_maps: int = 20                # --nfm
    num_feature_maps_multiplier: float = 1.1  # --nfmm
    kernel_size: int = 4                      # --ks
    stride_encode: int = 2                    # --se
    intermediate_layers: int = 2              # --il
    intermediate_kernel: int = 4              # --ik
    dropout_prob: float = 0.0                 # --dp
    # Post-maxout normalization inside conv blocks.  The reference selects
    # norm_type but hard-disables it (apply_norm=False, main_ct_vae.py:286);
    # here "instance" actually works (models/pvae.py:InstanceNorm).
    norm_type: Optional[str] = None           # None | "instance"
    use_normal: bool = True                   # --normal (Normal vs Beta latents/output)
    deterministic: bool = False               # --det

    # --- training (ref main_ct_vae.py:33-46, 53-60, 67-68, 91-92) ---
    batch_size: int = 4                       # -b
    num_iter: int = 100                       # -i
    num_samples: int = 2                      # --ns (ELBO samples)
    learning_rate: float = 1e-4               # --lr
    adam_epsilon: float = 1e-7                # --ae
    kl_anneal_factor: float = 1.0             # --klaf
    kl_multiplier: float = 1.0                # --klm
    norm: float = 100.0                       # --norm (per-tensor grad clip)
    save_interval: int = 100000               # --si
    example_num: int = 0                      # --en (visualization example)

    # --- rebuild-only knobs (no reference equivalent) ---
    seed: int = 0                             # explicit PRNG seed (ref: np.random.seed(0))
    # Encoder input scaling and loss scaling are quirks preserved from the
    # reference (helper_functions.py:239 `/300`, main_ct_vae.py:478 `/1e5`).
    input_encode_scale: float = 300.0
    loss_scale: float = 1e5
    # Mesh axis sizes for multi-chip runs; 1 means "use all available" is NOT
    # implied — sizes multiply to the device count used.
    mesh_data: int = 1                        # data-parallel axis size
    mesh_angle: int = 1                       # angle-sharding axis size
    # streaming data path: per-step host-local batch slices assembled into a
    # batch-sharded global array (for datasets too large to replicate on
    # device); default keeps the zero-transfer device-resident gather
    stream_batches: bool = False
    # Multi-host: jax.distributed.initialize() before building the mesh
    # (coordinator/process env vars or Cloud-TPU metadata; parallel/
    # distributed.py).  Host 0 owns checkpoints and metrics artifacts.
    multihost: bool = False                   # --multihost
    # Where compute happens: "auto" uses the default backend.
    use_pallas: bool = True                   # use Pallas projector kernels on TPU
    # Conv-stack compute dtype; "bfloat16" stores activations in bf16
    # (params stay float32; distribution math stays float32).  NOTE: measured
    # on the foam task, bf16 *storage* breaks ELBO training quality (A/B at
    # 6k iters: SSIM 0.195 f32 vs 0.011 bf16) while buying almost no speed —
    # the conv matmuls already run one-pass bf16 MXU products under f32
    # storage (see conv_precision below), so bf16 storage only shrinks the
    # elementwise/copy traffic.  Keep float32 for quality runs; bf16 remains
    # available for throughput experiments.
    compute_dtype: str = "float32"
    # MXU pass count for the conv matmuls, ORTHOGONAL to compute_dtype: f32
    # convolutions on TPU execute as bf16 MXU products (with f32 accumulate),
    # so storage and matmul precision are separate dials.  JAX's None already
    # lowers to Precision.DEFAULT = ONE bf16 pass (confirmed in the xplane
    # trace: conv fusions consume bf16-converted activations with this field
    # unset, and an A/B measured None == "default" at 37.7 vs 37.8 steps/s).
    # The useful directions are therefore "high"/"highest": multi-pass
    # bf16x3/bf16x6 products that reassemble f32-accurate results for
    # precision experiments, at ~3x/6x the matmul passes.  Quality context
    # (scripts/bf16_quality.sh family, 20k-iter foam quick A/B): bf16
    # *storage* (compute_dtype=bfloat16) costs ~-1.3 dB PSNR; the default
    # one-pass matmuls on f32 storage — what every headline run used — do
    # not, because activations stay unrounded between layers.
    conv_precision: Optional[str] = None      # None | "default" | "high" | "highest"
    # Conv-chain logical layout.  "NCHW" was built to put the 128-px W axis
    # on the TPU lane dim for the elementwise/pad/copy traffic (49% of step
    # device time, BENCH.md trace).  Measured: throughput-NEUTRAL (37.5/37.9
    # vs 37.7 steps/s paper loop) — XLA-TPU's layout assignment picks device
    # layouts independently of the logical dimension order, so the copy
    # churn in the trace is XLA's own choice, not addressable from here.
    # Kept as an equivalence-tested option for other backends/shapes.
    conv_layout: str = "NHWC"                 # "NHWC" | "NCHW"
    # Strided-conv algorithm.  "subpixel" rewrites every stride-s conv with
    # s | kernel as space-to-depth + a stride-1 conv over s^2x the channels,
    # and every stride-s transpose conv as one stride-1 conv producing all
    # s^2 output phases + depth-to-space (exact same math; equivalence-tested
    # in tests/test_conv_impl.py).  Motivation: the model's 10-48 channel
    # maps underfill the 128-wide MXU lane dim (BENCH.md trace) — the phase
    # form multiplies conv channels by s^2 and, because the rewritten convs
    # are stride-1, removes every lhs-dilated convolution from the backward
    # pass.  Measured on the paper config: see BENCH.md (A/B row).
    conv_impl: str = "direct"                 # "direct" | "subpixel" | "im2col"
    buffer_size: int = 100                    # shuffle buffer (ref create_dataset)
    # metrics flush block: per-step loss/kl/loglik stay on device and cross
    # to host as ONE stacked array every N steps (all steps still logged)
    metrics_every: int = 50
    # jax.profiler trace of this many train steps into <save_path>/profile
    # (the reference only records wall-clock .npy timings, SURVEY.md §5.1)
    profile_steps: int = 0
    # train steps fused into one device call (lax.scan over the jitted step).
    # On a remote-dispatch backend each per-step dispatch costs a host round
    # trip; fusing K steps amortizes it.  1 = dispatch every step.  The PRNG
    # key sequence, index streams, anneal recurrences and metric rows are
    # identical for any value (tests/test_train_toy.py equivalence test).
    steps_per_call: int = 8

    # ---- derived helpers ----
    @property
    def feature_maps_multiplier(self) -> int:
        # ref main_ct_vae.py:296-299 — probabilistic models double channels
        return 1 if self.deterministic else 2

    @property
    def num_algorithms(self) -> int:
        return len(self.algorithms)

    def feature_map_counts(self) -> List[int]:
        # ref main_ct_vae.py:295
        return [
            int(self.num_feature_maps * self.num_feature_maps_multiplier**i)
            for i in range(self.num_blocks)
        ]

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    # ---- serialization ----
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - names
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        # Coerce scalars to the declared field type.  YAML 1.1 (pyyaml) parses
        # "1.0e4" — no sign after the e — as a STRING, so numeric fields from
        # config files must be converted, and ints promote to float.
        coerced = dict(d)
        for f in dataclasses.fields(cls):
            if f.name not in coerced or coerced[f.name] is None:
                continue
            v = coerced[f.name]
            if f.type in ("float", "Optional[float]") and not isinstance(v, float):
                coerced[f.name] = float(v)
            elif f.type in ("int", "Optional[int]") and not isinstance(v, int):
                coerced[f.name] = int(v)
            elif f.type == "bool" and isinstance(v, str):
                coerced[f.name] = v.strip().lower() in ("1", "true", "yes", "on")
        return cls(**coerced)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                import yaml

                d = yaml.safe_load(f)
            else:
                d = json.load(f)
        return cls.from_dict(d)


# Recipe presets mirroring the reference's documented runs (README.md:73-221,
# BASELINE.md).  These are starting points; everything is overridable.
def toy_config(**kw: Any) -> Config:
    # README.md:199 toy recipe flags
    base = dict(
        truncate_dataset=1024,
        batch_size=4,
        num_sparse_angles=1,
        angles_per_iter=2,
        num_samples=10,
        toy_masks=True,
        no_pad=True,
        use_normal=True,
        poisson_noise_multiplier=1e4,
        pnm_start=1e3,
        intermediate_kernel=2,
        intermediate_layers=5,
        kernel_size=2,
        num_blocks=3,
        stride_encode=1,
        algorithms=["gridrec"],
    )
    base.update(kw)
    return Config(**base)


def foam_quick_config(**kw: Any) -> Config:
    base = dict(
        truncate_dataset=50,
        batch_size=5,
        num_iter=1000,
        num_sparse_angles=20,
        poisson_noise_multiplier=1e4,
        algorithms=["gridrec"],
    )
    base.update(kw)
    return Config(**base)


def foam_paper_config(**kw: Any) -> Config:
    # README.md:221 foam paper recipe flags
    base = dict(
        truncate_dataset=1000,
        batch_size=10,
        num_iter=100000,
        num_sparse_angles=20,
        angles_per_iter=20,
        num_samples=2,
        random_angles=True,
        poisson_noise_multiplier=1e4,
        pnm_start=1e3,
        algorithms=["sirt", "tv", "fbp", "gridrec"],
    )
    base.update(kw)
    return Config(**base)
