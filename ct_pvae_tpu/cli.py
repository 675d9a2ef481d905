"""Unified command-line interface.

The reference scatters entry points over bin/ and scripts/ (SURVEY.md L6);
here one CLI exposes the full workflow with subcommands, honoring the
reference's flag semantics (dest names match get_args, main_ct_vae.py:30-116):

  python -m ct_pvae_tpu.cli make-data --img-type foam -n 100
  python -m ct_pvae_tpu.cli train --input_path dataset_foam --save_path run --train ...
  python -m ct_pvae_tpu.cli merit --input_path dataset_foam --save_path run --pnm 1e4
  python -m ct_pvae_tpu.cli mcmc --save_path run
  python -m ct_pvae_tpu.cli visualize --input_path dataset_foam --save_path run --en 0
  python -m ct_pvae_tpu.cli boxplot --save_paths run1 run2 ...
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

import numpy as np

from .config import Config


def _add_train_args(p: argparse.ArgumentParser, suppress: bool = False) -> None:
    """Reference flags (main_ct_vae.py:30-116), same dests and defaults.

    With ``suppress=True`` every argument defaults to ``argparse.SUPPRESS`` so
    the resulting namespace contains ONLY flags the user actually typed —
    used to decide which values may override a ``--config`` file (a plain
    parse cannot distinguish "defaulted" from "explicitly passed").
    """
    add = p.add_argument

    def a(*names, **kw):
        if suppress:
            kw["default"] = argparse.SUPPRESS
        add(*names, **kw)
    a("--ae", type=float, dest="adam_epsilon", default=1e-7)
    a("-b", type=int, dest="batch_size", default=4)
    a("--ns", type=int, dest="num_samples", default=2)
    a("--det", action="store_true", dest="deterministic")
    a("--dp", type=float, dest="dropout_prob", default=0.0)
    a("--en", type=int, dest="example_num", default=0)
    a("-i", type=int, dest="num_iter", default=100)
    a("--ik", type=int, dest="intermediate_kernel", default=4)
    a("--il", type=int, dest="intermediate_layers", default=2)
    a("--input_path", dest="input_path")
    a("--klaf", type=float, dest="kl_anneal_factor", default=1.0)
    a("--klm", type=float, dest="kl_multiplier", default=1.0)
    a("--ks", type=int, dest="kernel_size", default=4)
    a("--lr", type=float, dest="learning_rate", default=1e-4)
    a("--nb", type=int, dest="num_blocks", default=3)
    a("--nfm", type=int, dest="num_feature_maps", default=20)
    a("--nfmm", type=float, dest="num_feature_maps_multiplier", default=1.1)
    a("--norm", type=float, dest="norm", default=100.0)
    a("--normal", action="store_true", dest="use_normal")
    a("--nsa", type=int, dest="num_sparse_angles", default=10)
    a("--api", type=int, dest="angles_per_iter", default=5)
    a("--pnm", type=float, dest="poisson_noise_multiplier", default=(2**16 - 1) * 0.41)
    a("--pnm_start", type=float, dest="pnm_start", default=None)
    a("--train_pnm", action="store_true", dest="train_pnm")
    a("-r", type=int, dest="restore_num", default=None)
    a("--random", action="store_true", dest="random_angles")
    a("--uniform", action="store_false", dest="random_angles", default=False,
      help="force uniform sparse-angle masks (overrides a config file's "
      "random_angles: true; the reference's default regime)")
    a("--restore", action="store_true", dest="restore")
    a("--resume_total", action="store_true", dest="resume_total",
      help="with --restore: num_iter counts TOTAL iterations incl. restored "
      "ones, replaying the uninterrupted run's exact step sequence "
      "(kill/resume recovery)")
    a("--save_path", dest="save_path")
    a("--se", type=int, dest="stride_encode", default=2)
    a("--si", type=int, dest="save_interval", default=100000)
    a("--td", type=int, dest="truncate_dataset", default=100)
    a("--train", action="store_true", dest="train")
    a("--ulc", action="store_true", dest="use_latest_ckpt")
    a("--visualize", action="store_true", dest="visualize")
    a("--pixel_dist", action="store_true", dest="pixel_dist")
    a("--num_repeats", type=int, dest="pixel_dist_repeats", default=10000)
    a("--ns1", type=int, dest="pixel_dist_samples_1", default=100)
    a("--real", action="store_true", dest="real_data")
    a("--no_pad", action="store_true", dest="no_pad")
    a("--toy_masks", action="store_true", dest="toy_masks")
    a("--algorithms", nargs="+", default=["gridrec"])
    a("--no_final_eval", action="store_true", dest="no_final_eval")
    a("--seed", type=int, dest="seed", default=0)
    a("--mesh_data", type=int, dest="mesh_data", default=1)
    a("--mesh_angle", type=int, dest="mesh_angle", default=1)
    a("--stream_batches", action="store_true", dest="stream_batches")
    a("--multihost", action="store_true", dest="multihost")
    a("--norm_type", dest="norm_type", default=None, choices=["instance"])
    a("--roll", action="store_true", dest="roll_augment")
    a("--reuse_cache", action="store_true", dest="reuse_cache")
    a("--metrics_every", type=int, dest="metrics_every", default=50)
    a("--spc", type=int, dest="steps_per_call", default=8,
      help="train steps fused per device call (lax.scan); 1 = step-per-dispatch")
    a("--compute_dtype", dest="compute_dtype", default="float32")
    a("--conv_precision", dest="conv_precision", default=None,
      choices=["default", "high", "highest"],
      help="MXU pass count for conv matmuls (storage stays compute_dtype); "
      "unset == 'default' == one bf16 pass; 'high'/'highest' = f32-accurate "
      "bf16x3/x6 multi-pass for precision experiments")
    a("--conv_layout", dest="conv_layout", default="NHWC",
      choices=["NHWC", "NCHW"],
      help="conv-chain device layout; NCHW puts image W on the TPU lane "
      "dim (identical numerics, faster elementwise/pad/copy traffic at "
      "this model's small channel counts)")
    a("--conv_impl", dest="conv_impl", default="direct",
      choices=["direct", "subpixel"],
      help="strided-conv algorithm; 'subpixel' = space-to-depth / "
      "pixel-shuffle phase form (exact same math, s^2 x conv channels, "
      "no lhs-dilated backward convs; measured throughput-neutral on "
      "TPU v5e at the paper shapes — see BENCH.md)")
    a("--config", dest="config_file", default=None, help="YAML/JSON config file")


def _cfg_from_args(args: argparse.Namespace, explicit: Optional[dict] = None) -> Config:
    """Build a Config from parsed flags.

    Precedence (highest first): explicitly-typed CLI flags, the ``--config``
    file, dataclass defaults.  ``explicit`` is the namespace of a
    ``suppress=True`` re-parse (only user-typed flags); without it, argparse
    defaults are indistinguishable from user input and would silently override
    the config file (store_true flags default to False, not None).
    """
    d = vars(args).copy()
    d.pop("command", None)
    config_file = d.pop("config_file", None)
    if config_file:
        base = Config.load(config_file).to_dict()
        overrides = explicit if explicit is not None else {
            k: v for k, v in d.items() if v is not None
        }
        base.update({k: v for k, v in overrides.items() if k != "config_file"})
        d = base
    d = {k: v for k, v in d.items() if k in Config.__dataclass_fields__}
    return Config.from_dict(d)


def cmd_make_data(argv) -> int:
    p = argparse.ArgumentParser(prog="make-data")
    p.add_argument("--img-type", choices=["foam", "toy"], default="foam")
    p.add_argument("-n", "--num-train", type=int, default=100)
    p.add_argument("--num-angles", type=int, default=180)
    p.add_argument("--n-pixel", type=int, default=128)
    p.add_argument("--save-path", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--h5-dir", default=None,
                   help="ingest real .h5 scans from this directory instead of "
                   "synthesizing images (reference scripts/preformat_data_h5.py)")
    p.add_argument("--slices", default="middle",
                   help="z slices per .h5 scan: 'middle' (reference parity), "
                   "'all', or an int count of evenly spaced slices — each "
                   "slice becomes one training example")
    args = p.parse_args(argv)
    if args.h5_dir is not None:
        from .data.real import preformat_h5

        save = args.save_path or "dataset_real"
        sinos, theta = preformat_h5(args.h5_dir, save, slices=args.slices)
        print(f"Shape of sinograms: {sinos.shape}")
        print(f"Saved under {save}/  (train with --real)")
        return 0
    from .data.sinogram import make_dataset

    save = args.save_path or (
        "dataset_foam" if args.img_type == "foam" else "dataset_toy_discrete2"
    )
    images, sinos, theta = make_dataset(
        args.img_type, args.num_train, save_path=save,
        num_angles=args.num_angles, n_pixel=args.n_pixel, seed=args.seed,
    )
    print(f"Shape of sinograms: {sinos.shape}")
    print(f"Shape of original training images: {images.shape}")
    print(f"Saved under {save}/")
    return 0


def _parse_train_cfg(argv, prog: str) -> Config:
    p = argparse.ArgumentParser(prog=prog)
    _add_train_args(p)
    args = p.parse_args(argv)
    sp = argparse.ArgumentParser(prog=prog)
    _add_train_args(sp, suppress=True)
    explicit = vars(sp.parse_args(argv))
    return _cfg_from_args(args, explicit=explicit)


def cmd_train(argv) -> int:
    cfg = _parse_train_cfg(argv, "train")
    if cfg.multihost:
        from .parallel import initialize

        initialize()
    from .vi.train import run

    loss_final_mean = run(cfg)
    print(f"Average loss final : {loss_final_mean}")
    if cfg.visualize:
        from .eval.visualize import visualize_run

        visualize_run(cfg)
    if cfg.pixel_dist:
        from .eval.pixel_dist import pixel_dist_run

        pixel_dist_run(cfg)
    return 0


def cmd_merit(argv) -> int:
    p = argparse.ArgumentParser(prog="merit")
    p.add_argument("--input_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--pnm", type=float, dest="poisson_noise_multiplier", required=True)
    p.add_argument(
        "--baseline_alg", choices=["fbp", "gridrec", "gridrec_fourier"],
        default="fbp",
        help="classical recon for the full/partial baseline rows. "
        "'gridrec_fourier' (alias: 'gridrec') = the Fourier-regridding class "
        "the reference's tomopy baselines use — the SAME algorithm that "
        "`train --algorithms gridrec_fourier` wires as an init channel "
        "(`train --algorithms gridrec` is the ramp-FBP artifact-compat "
        "channel instead); saves to final_ave_merit_gridrec.npy",
    )
    args = p.parse_args(argv)
    if args.baseline_alg == "gridrec_fourier":
        args.baseline_alg = "gridrec"  # one algorithm, one canonical name
    import os

    from .data import io as data_io
    from .eval.merit import final_merit

    sinos, theta, _ = data_io.load_dataset(args.input_path)
    gt = data_io.load_ground_truth(args.input_path)
    rec = np.load(os.path.join(args.save_path, "reconstruction_final.npy"))
    masks = np.load(os.path.join(args.save_path, "all_masks.npy"))
    proj = np.load(os.path.join(args.save_path, "all_proj_samples.npy"))
    mean_path = os.path.join(args.save_path, "reconstruction_mean.npy")
    rec_mean = np.load(mean_path) if os.path.exists(mean_path) else None
    final_merit(
        gt, sinos, masks, proj, rec, theta,
        args.poisson_noise_multiplier, save_path=args.save_path,
        reconstruction_mean=rec_mean, baseline_alg=args.baseline_alg,
    )
    return 0


def cmd_infer(argv) -> int:
    """Amortized inference: reconstruct NEW sinograms with a trained run.

    The serving path the reference lacks (its final_evaluation only rescores
    the training set, main_ct_vae.py:427-461): loads ``run_path/config.json``
    + checkpoint, runs the measurement model + init stack + amortized guide
    on fresh data, and writes posterior mean / std / sample maps."""
    p = argparse.ArgumentParser(prog="infer", description=cmd_infer.__doc__)
    p.add_argument("--run_path", required=True,
                   help="trained run dir (config.json + training_checkpoints/)")
    p.add_argument("--input_path", default=None,
                   help="dataset dir of NEW sinograms (default: the run's)")
    p.add_argument("--output", required=True, dest="output_path",
                   help="output dir for reconstruction artifacts")
    p.add_argument("--passes", type=int, default=8,
                   help="independent latent draws for the uncertainty map")
    p.add_argument("-r", type=int, dest="ckpt_num", default=None,
                   help="checkpoint number (default: latest)")
    p.add_argument("--real", action="store_true",
                   help="measured data: skip synthetic masking noise")
    p.add_argument("--pnm", type=float, default=None,
                   help="override the measurement dose (Poisson multiplier)")
    p.add_argument("--cheap_init", action="store_true",
                   help="substitute sirt/tv init channels with the one-shot "
                        "ramp-FBP (same channel layout; serving-latency mode)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    from .vi.infer import amortized_infer

    overrides = {}
    if args.real:
        overrides["real_data"] = True
    if args.pnm is not None:
        overrides["poisson_noise_multiplier"] = args.pnm
        overrides["pnm_start"] = None
    if args.cheap_init:
        overrides["cheap_init"] = True
    out = amortized_infer(
        args.run_path,
        args.output_path,
        input_path=args.input_path,
        num_passes=args.passes,
        ckpt_num=args.ckpt_num,
        overrides=overrides,
        seed=args.seed,
    )
    print(f"reconstructed {out['mean'].shape[0]} examples -> {args.output_path}")
    print(f"mean ELBO loss: {float(np.mean(out['loss'])):.6g}")
    return 0


def cmd_mcmc(argv) -> int:
    p = argparse.ArgumentParser(prog="mcmc")
    p.add_argument("--save_path", required=True, help="path of the VAE run (masks live there)")
    p.add_argument("--model", choices=["toy", "foam"], default="toy",
                   help="toy: 2x2 simplex posterior (reference bin/toy_mcmc_v2.py); "
                   "foam: full image-space posterior (north-star extension)")
    p.add_argument("-s", type=int, dest="number_of_steps", default=None,
                   help="post-burnin draws (default: 200000 toy, 2000 foam)")
    p.add_argument("-b", type=int, dest="burnin", default=None,
                   help="burn-in steps (default: 50000 toy, 1000 foam)")
    p.add_argument("--en", type=int, dest="example_num", default=0)
    p.add_argument("--pnm", type=float, default=None,
                   help="default: 1e3 toy; the run config's pnm for foam")
    p.add_argument("--chains", type=int, default=8)
    p.add_argument("--sampler", choices=["hmc", "nuts", "smc"], default=None,
                   help="default: hmc toy (reference kernel), nuts foam")
    p.add_argument("--prior", choices=["tv", "smooth", "flat"], default="tv",
                   help="foam pixel-space prior (mcmc/image_model.py)")
    p.add_argument("--prior_weight", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.model == "foam":
        from .eval.mcmc_run import run_foam_mcmc

        run_foam_mcmc(
            save_path=args.save_path,
            number_of_steps=args.number_of_steps if args.number_of_steps is not None else 2000,
            burnin=args.burnin if args.burnin is not None else 1000,
            example_num=args.example_num,
            poisson_noise_multiplier=args.pnm,
            num_chains=args.chains,
            sampler=args.sampler or "nuts",
            prior=args.prior,
            prior_weight=args.prior_weight,
            seed=args.seed,
        )
        return 0
    from .eval.mcmc_run import run_toy_mcmc

    run_toy_mcmc(
        save_path=args.save_path,
        number_of_steps=(
            args.number_of_steps if args.number_of_steps is not None else 200000
        ),
        burnin=args.burnin if args.burnin is not None else 50000,
        example_num=args.example_num,
        poisson_noise_multiplier=args.pnm if args.pnm is not None else 1e3,
        num_chains=args.chains,
        sampler=args.sampler or "hmc",
        seed=args.seed,
    )
    return 0


def cmd_visualize(argv) -> int:
    cfg = _parse_train_cfg(argv, "visualize")
    from .eval.visualize import visualize_run

    visualize_run(cfg)
    return 0


def cmd_visualize_dataset(argv) -> int:
    """Reference bin/visualize_dataset.py: full vs partial-random vs
    partial-uniform sinogram + padded ground truth for one example."""
    p = argparse.ArgumentParser(prog="visualize-dataset")
    p.add_argument("--en", type=int, dest="example_num", default=0)
    p.add_argument("--input_path", default="dataset_foam")
    p.add_argument("--save_path_random", default=None)
    p.add_argument("--save_path_uniform", default=None)
    p.add_argument("--nsa", type=int, dest="num_sparse_angles", default=20,
                   help="undoes the 1/nsa dose normalization on partials")
    p.add_argument("--out", dest="out_dir", default=None)
    args = p.parse_args(argv)
    from .eval.dataset_viz import visualize_dataset

    written = visualize_dataset(**vars(args))
    for name, path in written.items():
        print(name, path)
    return 0


def cmd_fidelity(argv) -> int:
    """Foam-generator/classical-init fidelity study (SURVEY hard parts #3/#5):
    packer porosity curve + full-sino FBP metric distributions."""
    p = argparse.ArgumentParser(prog="fidelity")
    p.add_argument("-n", type=int, dest="num", default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", dest="out_dir", default="fidelity_out")
    args = p.parse_args(argv)
    from .eval.fidelity import fidelity_report

    res = fidelity_report(args.out_dir, num=args.num, seed=args.seed)
    print(json.dumps(res, indent=1))
    return 0


def cmd_boxplot(argv) -> int:
    p = argparse.ArgumentParser(prog="boxplot")
    p.add_argument("--save_paths", nargs="+", required=True,
                   help="random-mask run dirs (trials)")
    p.add_argument("--uniform_paths", nargs="+", default=None,
                   help="paired uniform-mask run dirs; defaults to "
                        "<save_path>_uniform siblings when they all exist")
    p.add_argument("--out", default=".")
    args = p.parse_args(argv)
    from .eval.boxplot import make_box_plots

    make_box_plots(args.save_paths, args.out, uniform_paths=args.uniform_paths)
    return 0


def cmd_sweep(argv) -> int:
    """Hyperparameter sweep from a YAML file with base: / space: blocks
    (the reference's hpo-uq config role — see configs/hpo_foam.yaml)."""
    p = argparse.ArgumentParser(prog="sweep")
    p.add_argument("--config", required=True)
    p.add_argument("--save-root", default="sweep_out")
    p.add_argument("--processes", type=int, default=1)
    p.add_argument("--mode", choices=["random", "grid", "surrogate"], default=None,
                   help="override the config's mode (e.g. a random control arm "
                   "against the surrogate at equal budget)")
    p.add_argument("--trials", type=int, default=None,
                   help="override the config's num_trials")
    p.add_argument("--resume", action="store_true",
                   help="reuse completed trials recorded in "
                        "<save-root>/sweep_results.json (random/grid replay "
                        "the seed's first candidates; surrogate warm-starts "
                        "its fit from them)")
    args = p.parse_args(argv)
    import yaml

    from .hpo import SearchSpace, sweep

    with open(args.config) as f:
        spec = yaml.safe_load(f)
    for key in ("base", "space"):
        if key not in spec:
            print(f"sweep config must contain a '{key}:' block (see configs/hpo_foam.yaml)")
            return 2
    base = Config.from_dict(spec["base"])
    space = SearchSpace(
        params={k: tuple(v) if isinstance(v, list) and len(v) == 2 and all(
            isinstance(x, (int, float)) for x in v) else v
                for k, v in spec["space"].items()},
        integer=tuple(spec.get("integer", [])),
    )
    results = sweep(
        base, space,
        num_trials=args.trials if args.trials is not None else int(spec.get("num_trials", 8)),
        mode=args.mode or spec.get("mode", "random"),
        save_root=args.save_root,
        processes=args.processes,
        resume=args.resume,
    )
    best = results[0]
    print(f"best trial {best[0]}: loss={best[2]:.6g} overrides={best[1]}")
    return 0


def cmd_compare_projectors(argv) -> int:
    """Timing + accuracy comparison of the projector implementations
    (the reference's ctvae/tomopy_forward_compare.py role)."""
    p = argparse.ArgumentParser(prog="compare-projectors")
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--angles", type=int, default=180)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)
    if args.n < 4 or args.batch < 1 or args.angles < 1:
        print("compare-projectors: --n must be >= 4, --batch/--angles >= 1")
        return 2
    import time

    import jax
    import jax.numpy as jnp

    from .data.foam import generate_foam_images
    from .ops.radon import pad_phantom, radon
    from .ops.pallas_radon import radon_pallas

    imgs = generate_foam_images(args.batch, n_pixel=args.n, seed=0)
    theta = np.linspace(0, np.pi, args.angles, endpoint=False)
    padded = pad_phantom(jnp.asarray(imgs))
    n_det = padded.shape[-1]
    tt = tuple(theta.tolist())
    on_tpu = jax.default_backend() == "tpu"

    def bench(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s} {dt*1e3:8.2f} ms")
        return np.asarray(out)

    xla_fn = jax.jit(lambda: radon(padded, jnp.asarray(theta, jnp.float32)))
    r_xla = bench("xla gather projector", xla_fn)
    r_pal = None
    if on_tpu:
        pal_fn = jax.jit(lambda: radon_pallas(padded, tt, n_det))
        r_pal = bench("pallas MXU projector", pal_fn)
    try:
        from . import native

        if native.available():
            t0 = time.perf_counter()
            r_cpp = native.radon_oracle(np.asarray(padded), theta, n_det, step=0.5)
            print(f"{'C++ ray-march oracle':24s} {(time.perf_counter()-t0)*1e3:8.2f} ms")
            err = np.linalg.norm(r_xla - r_cpp) / np.linalg.norm(r_cpp)
            print(f"xla vs C++ oracle rel err: {err:.4f}")
            if r_pal is not None:
                errp = np.linalg.norm(r_pal - r_cpp) / np.linalg.norm(r_cpp)
                print(f"pallas vs C++ oracle rel err: {errp:.4f}")
    except Exception as e:
        print(f"(native oracle unavailable: {e})")
    return 0


def cmd_check(argv) -> int:
    """Environment smoke check (the reference's ctvae/check_gpu.py role)."""
    import jax

    print("jax", jax.__version__, "backend:", jax.default_backend())
    print("devices:", jax.devices())
    try:
        from . import native

        print("native C++ library:", "available" if native.available() else "unavailable")
    except Exception as e:
        print("native C++ library: error:", e)
    return 0


def cmd_bench_samplers(argv) -> int:
    """Posterior-sampling throughput: draws/s for HMC/NUTS/SMC on the toy
    posterior, chains/particles sharded over all local devices.

    The reference's comparable path is a single TFP HMC chain
    (bin/toy_mcmc_v2.py:139-148); there is no reference throughput number
    (SURVEY.md §6), so this prints absolute draws/s for the record.
    Timing forces a host read of a data-dependency-chained result (see
    BENCH.md: block_until_ready alone under-waits on the remote backend).
    """
    p = argparse.ArgumentParser(prog="bench-samplers")
    p.add_argument("--model", choices=["toy", "foam"], default="toy",
                   help="toy: 2x2 simplex posterior; foam: image-space "
                   "posterior through the Pallas projector (north star)")
    p.add_argument("--size", type=int, default=128,
                   help="foam image size (posterior dimension = size^2)")
    p.add_argument("--nsa", type=int, default=20,
                   help="foam: measured angles of 180 (reference recipe)")
    p.add_argument("--chains", type=int, default=None,
                   help="total chains (default 512 toy, 8 foam); with "
                   "--scaling, chains PER DEVICE")
    p.add_argument("--steps", type=int, default=None,
                   help="post-burnin draws (default 2000 toy, 100 foam)")
    p.add_argument("--burnin", type=int, default=None,
                   help="default 500 toy, 100 foam")
    p.add_argument("--pnm", type=float, default=None,
                   help="default 1e3 toy, 1e4 foam")
    p.add_argument("--samplers", nargs="+", default=["hmc", "nuts", "smc"])
    p.add_argument("--devices", type=int, default=None,
                   help="use only the first K local devices (default: all)")
    p.add_argument("--scaling", action="store_true",
                   help="weak-scaling sweep over 1,2,4,...,K devices: chains "
                        "per device held constant; prints draws/s and "
                        "efficiency vs 1 device (the BASELINE.md samples/s "
                        "scaling measurement — run on a multi-chip slice)")
    args = p.parse_args(argv)
    foam = args.model == "foam"
    if args.chains is None:
        args.chains = 8 if foam else 512
    if args.steps is None:
        args.steps = 100 if foam else 2000
    if args.burnin is None:
        args.burnin = 100 if foam else 500
    if args.pnm is None:
        args.pnm = 1e4 if foam else 1e3
    import time

    import jax
    import jax.numpy as jnp

    from .data.toy import generate_toy_images
    from .mcmc import HMCConfig, NUTSConfig, SMCConfig, hmc_sample, nuts_sample, smc_sample
    from .mcmc.toy_model import toy_posterior_sampler, toy_joint_log_prob
    from .parallel.chains import make_chains_mesh, shard_chains
    from .prob.bijectors import IteratedSigmoidCentered
    from .prob.distributions import toy_prior

    # toy geometry: 2x2 object, theta={0, pi/2}, mask=[1,0] (ref toy_mcmc_v2.py:40-51)
    obj = jnp.asarray(generate_toy_images(num_tiles=1)[0])
    theta = jnp.asarray([0.0, jnp.pi / 2], jnp.float32)
    proj = jnp.stack([obj.sum(axis=0), obj.sum(axis=1)])  # analytic row/col sums
    mask = jnp.asarray([1.0, 0.0])
    key = jax.random.PRNGKey(0)
    meas = jax.random.poisson(key, proj * mask[:, None] * args.pnm) / args.pnm
    used = np.asarray(mask) > 0
    theta_u = theta[np.nonzero(used)[0]]
    mask_u = mask[np.nonzero(used)[0]]
    meas_u = meas[np.nonzero(used)[0]]
    log_prob = toy_posterior_sampler(meas_u, theta_u, mask_u, args.pnm)
    dim = 3
    hmc_step, nuts_step, smc_step = 6.5e-2, 6.5e-2, SMCConfig().step_size
    smc_stages = SMCConfig().num_stages

    if foam:
        # image-space posterior: one synthetic foam phantom at --size, 180
        # angles, --nsa uniformly measured, true-Poisson noise — the
        # north-star workload at production geometry (VERDICT Next #1)
        from .data.foam import generate_foam_images
        from .data.recon_init import crop_center
        from .mcmc.image_model import (
            image_log_prior,
            init_chains_from_recon,
            make_image_log_prob,
            softplus_log_det_jacobian,
            softplus_forward,
        )
        from .ops.fbp import fbp
        from .ops.radon import num_proj_pixels, radon_fast

        h = args.size
        gt = jnp.asarray(generate_foam_images(1, n_pixel=h, seed=7)[0])
        theta_f = np.linspace(0, np.pi, 180, endpoint=False).astype(np.float32)
        n_det = num_proj_pixels(h, h)
        proj_f = radon_fast(gt[None], jnp.asarray(theta_f), pad=True)[0]
        mask_f = np.zeros(180, np.float32)
        # stride floor + count-derived dose so nsa values that do not divide
        # 180 stay consistent (measured-angle count == normalization)
        mask_f[:: max(1, 180 // args.nsa)] = 1.0
        mask_f *= 1.0 / mask_f.sum()
        pm = jnp.clip(proj_f * mask_f[:, None], 0, None)
        meas_f = jax.random.poisson(jax.random.PRNGKey(5), pm * args.pnm) / args.pnm
        used_f = mask_f > 0
        meas_u = meas_f[np.nonzero(used_f)[0]]
        theta_u = theta_f[used_f]
        mask_u = jnp.asarray(mask_f[used_f])
        dim = h * h
        log_prob = make_image_log_prob(
            meas_u, theta_u, mask_u, args.pnm, h, h, prior="tv", prior_weight=10.0
        )
        # warm start at the partial FBP (mcmc/image_model.py)
        unnorm = jnp.where(
            mask_f[:, None] > 0, meas_f / jnp.clip(mask_f[:, None], 1e-9), 0.0
        )
        init_recon = crop_center(
            fbp(unnorm[None], jnp.asarray(theta_f), n_det, n_det, "ramp")[0], h, h
        )
        hmc_step, nuts_step, smc_step = 1e-3, 1e-2, 1e-2
        smc_stages = 120

        def foam_log_prior(x):
            o = softplus_forward(x).reshape(h, h)
            return image_log_prior(o, "tv", 10.0) + softplus_log_det_jacobian(x)

        def foam_log_lik(x):
            return log_prob(x) - foam_log_prior(x)

    all_devices = jax.devices()
    if args.devices is not None:
        all_devices = all_devices[: args.devices]
    max_dev = len(all_devices)

    def timed(name, fn, draws, chains, n_dev):
        out = fn(jax.random.PRNGKey(1))        # compile + warmup
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(jax.random.PRNGKey(2))
        # force a host read through the result to defeat async dispatch
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        dt = time.perf_counter() - t0
        rate = draws / dt
        print(f"{name:6s} {rate:12.0f} draws/s   ({draws} draws in {dt:.2f}s, "
              f"{chains} chains x {n_dev} device(s))")
        return rate

    def run_samplers(n_dev, chains):
        """Time each requested sampler with `chains` sharded over n_dev devices."""
        mesh = (make_chains_mesh(n_dev, devices=all_devices)
                if n_dev > 1 and chains % n_dev == 0 else None)
        if foam:
            init = init_chains_from_recon(init_recon, chains, jax.random.PRNGKey(11))
        else:
            init = jnp.zeros((chains, dim))
        if mesh is not None:
            init = shard_chains(mesh, init)
        rates = {}
        for s in args.samplers:
            if s == "hmc":
                cfg = HMCConfig(num_results=args.steps, num_burnin=args.burnin,
                                num_leapfrog=5, step_size=hmc_step,
                                num_adaptation=max(400, args.burnin))
                rates[s] = timed("hmc", lambda k: hmc_sample(log_prob, init, k, cfg)[0],
                                 args.steps * chains, chains, n_dev)
            elif s == "nuts":
                cfg = NUTSConfig(num_results=args.steps, num_burnin=args.burnin,
                                 step_size=nuts_step)
                rates[s] = timed("nuts", lambda k: nuts_sample(log_prob, init, k, cfg)[0],
                                 args.steps * chains, chains, n_dev)
            elif s == "smc":
                if foam:
                    particles = init_chains_from_recon(
                        init_recon, chains, jax.random.PRNGKey(3), jitter=0.1
                    )
                    log_prior, log_lik = foam_log_prior, foam_log_lik
                else:
                    prior = toy_prior()
                    k1 = jax.random.PRNGKey(3)
                    particles = IteratedSigmoidCentered.inverse(prior.sample(k1, (chains,)))

                    def log_prior(x):
                        o = IteratedSigmoidCentered.forward(x)
                        return prior.log_prob(o) + IteratedSigmoidCentered.forward_log_det_jacobian(x)

                    def log_lik(x):
                        o = IteratedSigmoidCentered.forward(x)
                        return toy_joint_log_prob(o, meas_u, theta_u, mask_u, args.pnm) - \
                            prior.log_prob(jnp.maximum(o, np.finfo(np.float32).tiny))

                if mesh is not None:
                    particles = shard_chains(mesh, particles)
                cfg = SMCConfig(num_particles=chains, num_stages=smc_stages,
                                step_size=smc_step)
                rates[s] = timed("smc", lambda k: smc_sample(log_prior, log_lik,
                                                             particles, k, cfg)[0],
                                 chains, chains, n_dev)
            else:
                print(f"unknown sampler {s!r}")
                return None
        return rates

    if not args.scaling:
        return 0 if run_samplers(max_dev, args.chains) is not None else 2

    # Weak scaling: chains-per-device constant; perfect scaling = flat
    # draws/s/device.  Efficiency vs the 1-device run is the BASELINE.md
    # "samples/s scaling" number (>=80% target on 2+ hosts).
    sweep = [1]
    while sweep[-1] * 2 <= max_dev:
        sweep.append(sweep[-1] * 2)
    base = {}
    for n_dev in sweep:
        rates = run_samplers(n_dev, args.chains * n_dev)
        if rates is None:
            return 2
        for s, r in rates.items():
            per_dev = r / n_dev
            if n_dev == 1:
                base[s] = per_dev
                continue
            eff = per_dev / base[s]
            print(f"  -> {s}: {per_dev:.0f} draws/s/device, "
                  f"weak-scaling efficiency vs 1 device: {eff:.0%}")
    return 0


COMMANDS = {
    "check": cmd_check,
    "make-data": cmd_make_data,
    "train": cmd_train,
    "merit": cmd_merit,
    "infer": cmd_infer,
    "mcmc": cmd_mcmc,
    "visualize": cmd_visualize,
    "visualize-dataset": cmd_visualize_dataset,
    "fidelity": cmd_fidelity,
    "boxplot": cmd_boxplot,
    "sweep": cmd_sweep,
    "compare-projectors": cmd_compare_projectors,
    "bench-samplers": cmd_bench_samplers,
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; options: {', '.join(COMMANDS)}")
        return 2
    return COMMANDS[cmd](rest)


if __name__ == "__main__":
    raise SystemExit(main())
