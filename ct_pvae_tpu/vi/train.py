"""Training runtime — the TPU-native replacement for the CT_VAE orchestrator.

Reference: ctvae/main_ct_vae.py:118-486.  Differences by design:

  * the whole (truncated) dataset lives on device; a batch is a gather by
    index — zero host<->device transfer per step (vs tf.data streaming)
  * one jit-compiled ``train_step`` fuses KL-anneal update, pnm anneal, angle
    subsampling gather, ELBO, NaN-guarded per-tensor-clipped Adam update
  * explicit PRNG keys; kl_anneal/pnm live inside the TrainState pytree
  * sharding: batch on the 'data' mesh axis, physics-likelihood angles on the
    'angle' axis; XLA inserts the psum for gradients/log-lik sums
  * checkpoints: full TrainState (params + opt state + anneal state), same
    ``training_checkpoints/ckpt-N`` naming as tf.train.Checkpoint
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..data import io as data_io
from ..data.masks import create_all_masks
from ..data.recon_init import classical_recon_stack
from ..models.pvae import build_models
from ..parallel.distributed import (
    host_local_batch_slice,
    is_primary,
    make_global_batch,
    put_replicated,
)
from ..parallel.mesh import make_mesh
from ..utils.batching import IndexStream
from ..utils.metrics import MetricsLogger
from .loss import elbo_loss


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    kl_anneal: jnp.ndarray
    pnm: jnp.ndarray
    step: jnp.ndarray


def nan_zero_and_clip(norm: float) -> optax.GradientTransformation:
    """Zero NaN gradients then clip each tensor by norm — the reference's
    exact gradient hygiene (main_ct_vae.py:482-484)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def fix(g):
            g = jnp.where(jnp.isnan(g), jnp.zeros_like(g), g)
            gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.where(gnorm > norm, norm / (gnorm + 1e-30), 1.0)
            return g * scale

        return jax.tree_util.tree_map(fix, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class Trainer:
    """Builds data, models and the fused train step; runs the loop."""

    def __init__(
        self,
        cfg: Config,
        sinograms: Optional[np.ndarray] = None,
        theta: Optional[np.ndarray] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.setup_start_time = time.time()
        if sinograms is None:
            if cfg.input_path is None:
                raise ValueError(
                    "config.input_path is required (or pass sinograms/theta arrays); "
                    "create a dataset first: python -m ct_pvae_tpu.cli make-data"
                )
            sinograms, theta, _ = data_io.load_dataset(cfg.input_path)
        sinograms = np.clip(np.asarray(sinograms, np.float32)[: cfg.truncate_dataset], 0, None)
        self.theta = np.asarray(theta, np.float32)
        self.num_angles = len(self.theta)
        self.num_proj_pix = sinograms.shape[-1]

        # recon size rule (ref main_ct_vae.py:156-161)
        if cfg.no_pad:
            self.x_size = self.y_size = self.num_proj_pix
        else:
            self.x_size = self.y_size = int(np.floor(self.num_proj_pix / np.sqrt(2) - 2))

        if cfg.save_path:
            os.makedirs(cfg.save_path, exist_ok=True)
            if cfg.train and is_primary():
                # persist the full config with the run so eval/infer tooling
                # can rebuild the exact model without re-specifying flags
                cfg.save(os.path.join(cfg.save_path, "config.json"))

        # masks + noisy measurements (ref L2).  Multi-host: every host reads
        # caches, but only host 0 writes them (the np.save calls inside are
        # is_primary()-gated — concurrent identical writes would race).
        self.all_masks, self.all_proj_samples = create_all_masks(
            sinograms,
            self.num_angles,
            save_path=cfg.save_path,
            poisson_noise_multiplier=cfg.poisson_noise_multiplier,
            num_sparse_angles=cfg.num_sparse_angles,
            random=cfg.random_angles,
            real_data=cfg.real_data,
            train=cfg.train,
            truncate_dataset=cfg.truncate_dataset,
            toy_masks=cfg.toy_masks,
            seed=cfg.seed,
            reuse_cache=cfg.reuse_cache,
        )
        self.x_train_sinograms = sinograms

        # classical-recon encoder inputs (ref iradon_all)
        self.all_input_encode = classical_recon_stack(
            self.all_proj_samples,
            self.all_masks,
            self.theta,
            cfg.algorithms,
            self.x_size,
            self.y_size,
            save_path=cfg.save_path,
            train=cfg.train,
            reuse_cache=cfg.reuse_cache,
            cheap_init=cfg.cheap_init,
        )
        self.train_size = (len(sinograms) // cfg.batch_size) * cfg.batch_size

        # pnm anneal factor (ref main_ct_vae.py:146-149)
        if cfg.pnm_start is not None:
            self.pnm_anneal_factor = float(
                np.exp(np.log(cfg.poisson_noise_multiplier / cfg.pnm_start) / max(cfg.num_iter, 1))
            )
            pnm0 = cfg.pnm_start
        else:
            self.pnm_anneal_factor = 1.0
            pnm0 = cfg.poisson_noise_multiplier

        # models
        in_channels = self.all_input_encode.shape[-1]
        self.encoder, self.decoder, self.skip_shapes = build_models(
            self.x_size, self.y_size, in_channels, cfg
        )
        key = jax.random.PRNGKey(cfg.seed)
        k_enc, k_dec, self.loop_key = jax.random.split(key, 3)
        dummy_in = jnp.zeros((cfg.batch_size, self.x_size, self.y_size, in_channels))
        enc_params = self.encoder.init({"params": k_enc}, dummy_in)["params"]
        dummy_skips = self.encoder.apply({"params": enc_params}, dummy_in)
        if cfg.deterministic:
            # fmm == 1: the skips ARE the latents (no loc/scale split)
            dummy_latents = dummy_skips
        else:
            dummy_latents = [jnp.split(s, 2, axis=-1)[0] for s in dummy_skips]
        dec_params = self.decoder.init({"params": k_dec}, dummy_latents)["params"]
        params = {"encoder": enc_params, "decoder": dec_params}
        if cfg.train_pnm:
            # reference --train_pnm: pnm joins the trainables
            # (main_ct_vae.py:467-470)
            params["log_pnm"] = jnp.log(jnp.float32(pnm0))

        self.tx = optax.chain(
            nan_zero_and_clip(cfg.norm),
            optax.adam(cfg.learning_rate, eps=cfg.adam_epsilon),
        )
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            kl_anneal=jnp.float32(1.0),
            pnm=jnp.float32(pnm0),
            step=jnp.int32(0),
        )

        # device-resident dataset
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_data, cfg.mesh_angle)
        self.data = {
            "proj_sample": jnp.asarray(self.all_proj_samples),
            "mask": jnp.asarray(self.all_masks),
            "input_encode": jnp.asarray(self.all_input_encode),
        }
        # multi-process safe replication (jax.make_array_from_process_local_data
        # under the hood when process_count > 1; plain device_put otherwise)
        self.data = put_replicated(self.data, self.mesh)
        self.state = put_replicated(self.state, self.mesh)

        self._train_step_fn = self._build_step(training=True)
        self._eval_step_fn = self._build_step(training=False)
        self._train_step = jax.jit(self._train_step_fn, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_fn)
        # host 0 owns metrics files; other hosts keep an in-memory logger only
        self.metrics = MetricsLogger(cfg.save_path if is_primary() else None)

        if cfg.restore and cfg.save_path:
            self.restore(cfg.restore_num, cfg.use_latest_ckpt)

    # ------------------------------------------------------------------
    def _to_host(self, x) -> np.ndarray:
        """Host copy of a step output.

        Multi-process, batch-sharded outputs span devices this host cannot
        address, so ``np.asarray`` would raise; replicate on the mesh first
        (an XLA all_gather over DCN/ICI), then fetch.  Single-process or
        already-replicated arrays fetch directly.
        """
        if (
            jax.process_count() > 1
            and self.mesh is not None
            and not getattr(x, "is_fully_replicated", True)
        ):
            x = jax.jit(
                lambda a: a, out_shardings=NamedSharding(self.mesh, P())
            )(x)
        return np.asarray(x)

    # ------------------------------------------------------------------
    def _build_step(self, training: bool, skip_gather: bool = False):
        """``skip_gather``: the streaming data path passes the already-sliced
        global batch as ``data`` (batch_idx unused) — a traced-index take on a
        batch-sharded array would force XLA to treat it as a cross-shard
        gather."""
        cfg = self.cfg
        theta = jnp.asarray(self.theta)
        n_det = self.num_proj_pix
        pad = not cfg.no_pad
        encoder, decoder = self.encoder, self.decoder
        mesh = self.mesh
        tx = self.tx
        pnm_anneal_factor = self.pnm_anneal_factor

        # Projector for the physics likelihood: the Pallas MXU kernel (fused
        # dual-axis form supports traced angle subsets).  On a mesh the
        # kernel runs per-shard under shard_map: batch sharded on 'data',
        # angle subset sharded on 'angle' (the log-likelihood reduction over
        # the sharded axes becomes an XLA psum at the loss).  The XLA gather
        # projector remains the small-geometry/CPU fallback.
        project_fn = None
        use_pallas = cfg.use_pallas and n_det >= 64 and (
            jax.default_backend() == "tpu" or mesh is not None
        )
        if use_pallas and mesh is not None:
            # shard_map needs exact divisibility along both sharded axes
            a_size = mesh.shape["angle"]
            d_size = mesh.shape["data"]
            api = min(cfg.angles_per_iter, self.num_angles)
            if (
                cfg.batch_size % d_size
                or api % a_size
                or self.num_angles % a_size
            ):
                use_pallas = False
        if use_pallas:
            from ..ops.pallas_radon import angle_table_fused, radon_pallas_fused
            from ..ops.radon import pad_phantom

            # Fused dual-axis table: one kernel pass per angle (the dual-
            # table form ran both major-axis kernels over every angle).
            # The Joseph-method kernel integrates over the image support
            # only, so the reference's zero-padding of the recon to
            # n_det x n_det before projection (pad_phantom, ref
            # forward_functions.py:18-46) is a no-op for it: building the
            # scalar table for the UNPADDED square recon projects onto the
            # same n_det detector exactly (tested), with n_det/x_size fewer
            # row matmuls per angle and no per-step pad copy.
            skip_pad = pad and self.x_size == self.y_size
            img_hw = self.x_size if skip_pad else n_det
            table_f = jnp.asarray(
                angle_table_fused(self.theta, img_hw, img_hw, n_det)
            )
            # interpret mode makes the kernels pure-JAX for CPU test meshes
            interpret = jax.default_backend() != "tpu"

            def _project(recon_sq, sc):
                return radon_pallas_fused(recon_sq, sc, n_det, interpret)

            if mesh is not None:
                # check_vma=False: pallas_call's out_shape carries no
                # varying-mesh-axes annotation
                _project_sharded = jax.shard_map(
                    _project,
                    mesh=mesh,
                    in_specs=(P("data", None, None), P("angle", None)),
                    out_specs=P("data", "angle", None),
                    check_vma=False,
                )

            def project_fn(recon, angles_i):
                if pad and not skip_pad:
                    recon = pad_phantom(recon, n_det)
                idx = (
                    jnp.arange(self.num_angles, dtype=jnp.int32)
                    if angles_i is None
                    else angles_i
                )
                sc = jnp.take(table_f, idx, axis=0)
                if mesh is not None:
                    return _project_sharded(recon, sc)
                return _project(recon, sc)

        def shard_batch(batch):
            if mesh is None:
                return batch
            return {
                "proj_sample": jax.lax.with_sharding_constraint(
                    batch["proj_sample"], NamedSharding(mesh, P("data", "angle", None))
                ),
                "mask": jax.lax.with_sharding_constraint(
                    batch["mask"], NamedSharding(mesh, P("data", "angle"))
                ),
                "input_encode": jax.lax.with_sharding_constraint(
                    batch["input_encode"], NamedSharding(mesh, P("data"))
                ),
            }

        def step(state: TrainState, data: Dict, batch_idx, angle_idx, key):
            if skip_gather:
                batch = data
            else:
                batch = {k: jnp.take(v, batch_idx, axis=0) for k, v in data.items()}
            if training and cfg.roll_augment:
                from .augment import roll_batch

                key, roll_key = jax.random.split(key)
                batch = roll_batch(batch, theta, roll_key)
            batch = shard_batch(batch)
            kl_anneal = (
                jnp.clip(state.kl_anneal * cfg.kl_anneal_factor, 0.0, 100.0)
                if training
                else state.kl_anneal
            )
            # clamp: annealing ends at num_iter (a restored/eval state may
            # carry step == num_iter; factor**step would overflow past it)
            anneal_pow = pnm_anneal_factor ** jnp.minimum(
                state.step, cfg.num_iter
            ).astype(jnp.float32)

            def loss_fn(params):
                # --train_pnm: pnm is a trainable parameter (ref :467-470)
                base_pnm = (
                    jnp.exp(params["log_pnm"]) if cfg.train_pnm else state.pnm
                )
                pnm_i = base_pnm * anneal_pow
                return elbo_loss(
                    params,
                    batch,
                    key,
                    encoder=encoder,
                    decoder=decoder,
                    theta=theta,
                    angles_i=angle_idx,
                    kl_anneal=kl_anneal,
                    kl_multiplier=cfg.kl_multiplier,
                    pnm=pnm_i,
                    num_samples=cfg.num_samples,
                    use_normal=cfg.use_normal,
                    deterministic=cfg.deterministic,
                    num_blocks=cfg.num_blocks,
                    pad=pad,
                    n_det=n_det,
                    input_encode_scale=cfg.input_encode_scale,
                    loss_scale=cfg.loss_scale,
                    training=training,
                    project_fn=project_fn,
                )

            if training:
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                new_state = state.replace(
                    params=params,
                    opt_state=opt_state,
                    kl_anneal=kl_anneal,
                    step=state.step + 1,
                )
                # compact on-device metrics: the loop reads these back in
                # blocks of cfg.metrics_every (ONE host transfer per block)
                # instead of the reference's 4 blocking reads per step
                metrics = jnp.stack(
                    [loss, jnp.mean(aux.kl), aux.loglik, kl_anneal]
                )
                return new_state, metrics
            loss, aux = loss_fn(state.params)
            return state, loss, aux

        return step

    # ------------------------------------------------------------------
    def train(self) -> None:
        cfg = self.cfg
        batch_stream = IndexStream(len(self.x_train_sinograms), cfg.batch_size, cfg.seed + 1)
        angle_stream = IndexStream(
            self.num_angles, min(cfg.angles_per_iter, self.num_angles), cfg.seed + 2
        )
        key = self.loop_key
        setup_time_saved = False
        start_time = time.time()
        profile_started = False
        # Per-step metrics stay on device; every ``metrics_every`` steps ONE
        # stacked (N,4) array crosses to host and all N rows are logged (full
        # per-step resolution, none of the reference's per-step host syncs).
        # The NaN-loss stop (ref main_ct_vae.py:401-402) fires on the same
        # block cadence.
        start_step = int(self.state.step)
        flush_every = max(1, cfg.metrics_every)
        metric_buf = []
        stop = False

        # Elastic resume: a restored run replays the exact per-step sequence
        # the uninterrupted run would have produced — step keys derive from
        # the ABSOLUTE step (fold_in below, O(1) regardless of start_step)
        # and the host index streams fast-forward over the consumed prefix.
        # With ``resume_total`` num_iter counts TOTAL iterations including
        # the restored ones (kill/resume recovery: relaunch with the same
        # config + --restore --ulc --resume_total and the final state matches
        # an uninterrupted run); default keeps the reference-style "+extra"
        # semantics the extension scripts use.
        if start_step:
            batch_stream.skip(start_step)
            angle_stream.skip(start_step)
        target_iters = cfg.num_iter - start_step if cfg.resume_total else cfg.num_iter
        target_iters = max(target_iters, 0)

        # streaming data path (multi-host datasets too large to replicate):
        # each host slices its part of the batch from host memory and the
        # global batch is assembled batch-sharded on the 'data' axis
        stream = cfg.stream_batches and self.mesh is not None
        if stream:
            from jax.sharding import PartitionSpec

            stream_step = jax.jit(
                self._build_step(training=True, skip_gather=True),
                donate_argnums=(0,),
            )
            host_np = {
                "proj_sample": np.asarray(self.all_proj_samples, np.float32),
                "mask": np.asarray(self.all_masks, np.float32),
                "input_encode": np.asarray(self.all_input_encode, np.float32),
            }
            stream_specs = {k: PartitionSpec("data") for k in host_np}
            dummy_idx = jnp.zeros((0,), jnp.int32)

        # Multi-step fusion: lax.scan over the jitted step runs K iterations
        # per device call, so the per-step host dispatch round trip (the
        # dominant fixed cost on a remote-dispatch backend) is paid once per
        # K steps.  Chunks never cross a save_interval boundary and carry the
        # exact per-step key/index sequence, so any steps_per_call value
        # (including 1) trains identically step for step.
        spc = max(1, int(cfg.steps_per_call))
        use_scan = spc > 1 and not stream and not cfg.profile_steps
        if use_scan and cfg.save_path and cfg.save_interval <= spc:
            print(
                f"warning: save_interval={cfg.save_interval} <= "
                f"steps_per_call={spc} forces 1-step chunks and disables "
                "multi-step dispatch fusion; raise save_interval to fuse"
            )
        if use_scan and getattr(self, "_train_scan", None) is None:
            single = self._train_step_fn

            def _multi(state, data, bidx_k, aidx_k, keys_k):
                def body(st, xs):
                    return single(st, data, *xs)

                return jax.lax.scan(body, state, (bidx_k, aidx_k, keys_k))

            self._train_scan = jax.jit(_multi, donate_argnums=(0,))

        si = max(1, cfg.save_interval)
        buf_rows = 0
        it = 0
        while it < target_iters:
            if cfg.profile_steps and cfg.save_path:
                # trace steps [2, 2+profile_steps) after warmup/compile
                if it == 2:
                    jax.profiler.start_trace(os.path.join(cfg.save_path, "profile"))
                    profile_started = True
                elif profile_started and it >= 2 + cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profile_started = False
            if use_scan:
                if cfg.save_path:
                    # end the chunk exactly at the next save boundary (an iter
                    # j with j % si == 0 saves after executing, ref :409-415)
                    j0 = it if it % si == 0 else ((it // si) + 1) * si
                    k_steps = min(spc, target_iters - it, j0 - it + 1)
                else:
                    # no checkpoints happen without a save_path, so there is
                    # no boundary to respect — keep full-size fused chunks
                    k_steps = min(spc, target_iters - it)
            else:
                k_steps = 1
            skeys, bidxs, aidxs = [], [], []
            for j in range(k_steps):
                # absolute-step key: restart-invariant (elastic resume) and
                # identical across hosts and scan/non-scan dispatch paths
                skey = jax.random.fold_in(key, start_step + it + j)
                skeys.append(skey)
                bidxs.append(batch_stream.next())
                aidxs.append(angle_stream.next())
            last = it + k_steps - 1
            if stream:
                batch_idx = bidxs[0]
                lo, n_loc = host_local_batch_slice(cfg.batch_size)
                local = {
                    k: v[batch_idx[lo : lo + n_loc]] for k, v in host_np.items()
                }
                gbatch = make_global_batch(self.mesh, local, stream_specs)
                self.state, step_metrics = stream_step(
                    self.state, gbatch, dummy_idx, jnp.asarray(aidxs[0]), skeys[0]
                )
                metric_buf.append(step_metrics[None])
            elif use_scan and k_steps == spc:
                self.state, step_metrics = self._train_scan(
                    self.state,
                    self.data,
                    jnp.asarray(np.stack(bidxs)),
                    jnp.asarray(np.stack(aidxs)),
                    jnp.stack(skeys),
                )
                metric_buf.append(step_metrics)  # (K, 4)
            else:
                # partial chunks (save/end boundaries) run step-per-dispatch:
                # scan length is a static shape, so a K<spc scan would compile
                # a fresh program per distinct tail length
                for bi, ai, sk in zip(bidxs, aidxs, skeys):
                    self.state, step_metrics = self._train_step(
                        self.state, self.data, jnp.asarray(bi), jnp.asarray(ai), sk
                    )
                    metric_buf.append(step_metrics[None])
            buf_rows += k_steps
            if buf_rows >= flush_every or last == target_iters - 1:
                block = np.asarray(jnp.concatenate(metric_buf))  # one device->host read
                first = start_step + last + 1 - buf_rows + 1
                for j, row in enumerate(block):
                    self.metrics.log(
                        first + j,
                        loss=row[0],
                        kl=row[1],
                        loglik=row[2],
                        kl_anneal=row[3],
                    )
                metric_buf = []
                buf_rows = 0
                if np.isnan(block[:, 0]).any():
                    # ref aborts on NaN loss (main_ct_vae.py:401-402); we stop
                    # training but keep artifacts.
                    print(f"NaN loss within steps ending at iter {last}; stopping")
                    stop = True
            if not setup_time_saved:
                # ref saves setup wall-clock at first iter (main_ct_vae.py:403-408)
                setup_time_saved = True
                if cfg.save_path and is_primary():
                    np.save(
                        os.path.join(cfg.save_path, "setup_time.npy"),
                        (time.time() - self.setup_start_time) / 60.0,
                    )
                start_time = time.time()
            if cfg.save_path and is_primary() and (
                last % cfg.save_interval == 0 or last == target_iters - 1
            ):
                self.metrics.save_npy_contract()
                self.checkpoint()
            if stop:
                break
            it += k_steps
        if profile_started:
            jax.profiler.stop_trace()
        if cfg.save_path and is_primary():
            np.save(
                os.path.join(cfg.save_path, "training_time.npy"),
                (time.time() - start_time) / 60.0,
            )
            self.metrics.save_npy_contract()
            self.metrics.save_plots()

    # ------------------------------------------------------------------
    def final_evaluation(self) -> float:
        """Unshuffled full pass; saves loss_final / reconstruction_final
        (ref main_ct_vae.py:427-461).  Returns loss_final_mean (HPO objective)."""
        cfg = self.cfg
        stream = IndexStream(len(self.x_train_sinograms), cfg.batch_size, 0, shuffle=False)
        key = jax.random.PRNGKey(cfg.seed + 3)
        start = time.time()
        losses, recons, recon_means = [], [], []
        angle_all = jnp.arange(self.num_angles, dtype=jnp.int32)
        for _ in range(self.train_size // cfg.batch_size):
            key, skey = jax.random.split(key)
            _, loss, aux = self._eval_step(
                self.state, self.data, jnp.asarray(stream.next()), angle_all, skey
            )
            losses.append(float(loss))
            # ref collects output_dist.sample() (a draw, not the mean, :446)
            recons.append(self._to_host(aux.recon_sample)[..., None])
            recon_means.append(self._to_host(aux.recon_mean)[..., None])
        loss_final = np.asarray(losses)
        reconstruction_final = np.concatenate(recons, axis=0)
        if cfg.save_path and is_primary():
            np.save(os.path.join(cfg.save_path, "loss_final.npy"), loss_final)
            np.save(
                os.path.join(cfg.save_path, "reconstruction_final.npy"),
                reconstruction_final,
            )
            # rebuild-only extra: the posterior-mean reconstruction (no
            # per-pixel sampling speckle); the sampled artifact above keeps
            # the reference quirk for parity scoring
            np.save(
                os.path.join(cfg.save_path, "reconstruction_mean.npy"),
                np.concatenate(recon_means, axis=0),
            )
            np.save(
                os.path.join(cfg.save_path, "final_train_time.npy"),
                (time.time() - start) / 60.0,
            )
        self.loss_final_mean = float(np.mean(loss_final))
        return self.loss_final_mean

    # ------------------------------------------------------------------
    def checkpoint(self) -> str:
        # multi-host: host 0 owns checkpoints/metrics (SURVEY.md §5.8); params
        # are replicated identically on every host (same seed, psummed grads)
        if not is_primary():
            return ""
        ckpt_dir = os.path.join(self.cfg.save_path, "training_checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        n = int(self.state.step)
        path = os.path.join(ckpt_dir, f"ckpt-{n}.msgpack")
        # atomic write (tmp + rename): a host killed mid-checkpoint must
        # never leave a truncated ckpt-N for the relaunch to trip over —
        # the durability contract kill/resume recovery depends on
        # (tests/test_multihost.py::test_kill_and_resume_matches_uninterrupted)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(self.state))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return path

    def restore(
        self,
        restore_num: Optional[int] = None,
        use_latest: bool = False,
        ckpt_dir: Optional[str] = None,
    ) -> None:
        """Load params/opt/anneal state from a checkpoint.

        ``ckpt_dir`` overrides the run directory the checkpoint is read from
        (default: this trainer's own save_path) — the amortized-inference path
        restores a TRAINED run's weights while writing its outputs elsewhere.
        """
        if ckpt_dir is None:
            ckpt_dir = self.cfg.save_path
        ckpt_dir = os.path.join(ckpt_dir, "training_checkpoints")
        if use_latest or restore_num is None:
            cands = sorted(
                (
                    f
                    for f in os.listdir(ckpt_dir)
                    # skip in-flight atomic-write temps from a live/killed run
                    if f.startswith("ckpt-") and f.endswith(".msgpack")
                ),
                key=lambda f: int(f.split("-")[1].split(".")[0]),
            )
            if not cands:
                raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
            path = os.path.join(ckpt_dir, cands[-1])
        else:
            path = os.path.join(ckpt_dir, f"ckpt-{restore_num}.msgpack")
        with open(path, "rb") as f:
            restored = serialization.from_bytes(self.state, f.read())
        # from_bytes yields host numpy leaves; re-place them on the mesh so
        # multi-process restore (every host reads the shared checkpoint)
        # reconstructs proper global arrays
        self.state = put_replicated(restored, self.mesh)


def run(cfg: Config, sinograms=None, theta=None) -> float:
    """Reference ``main(**kwargs) -> loss_final_mean`` equivalent
    (main_ct_vae.py:733-735)."""
    trainer = Trainer(cfg, sinograms=sinograms, theta=theta)
    if cfg.train:
        trainer.train()
    loss_final_mean = float("nan")
    if not cfg.no_final_eval:
        loss_final_mean = trainer.final_evaluation()
    return loss_final_mean
