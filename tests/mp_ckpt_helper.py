"""Helper for the REAL 2-process checkpoint/resume test (spawned by
tests/test_multiprocess_ckpt.py). Each process joins a jax.distributed CPU
cluster, builds the same tiny model + ExpManager, trains 2 steps, saves
through the collective orbax path, exits; the resume phase restores and
prints a param digest that must agree across processes.

argv: <process_id> <num_processes> <coordinator_port> <workdir> <phase>
"""

import sys


def main():
    pid, nprocs, port, workdir, phase = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    import numpy as np
    import jax.numpy as jnp

    from mridc_tpu.models import build_model
    from mridc_tpu.train.exp_manager import ExpManager
    from mridc_tpu.train.trainer import Trainer

    # 1) the run-dir broadcast itself: every process must derive the SAME
    #    timestamp version (exp_manager.py broadcast_one_to_all)
    em_stamp = ExpManager(exp_dir=workdir + "/stampcheck", name="mp")
    print(f"STAMP {pid} {em_stamp.log_dir}", flush=True)

    model = build_model({
        "model_name": "UNET", "channels": 4, "pooling_layers": 2,
        "fft_centered": True, "fft_normalization": "ortho",
    })
    em = ExpManager(
        exp_dir=workdir, name="mp", version="run",
        resume_if_exists=(phase == "resume"), save_top_k=2,
    )
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, exp_manager=em)

    rng = np.random.default_rng(0)  # same on both processes; replicated batch
    b, c, h, w = 2, 3, 32, 32
    batch = {
        "masked_kspace": rng.standard_normal((b, c, h, w, 2)).astype(np.float32),
        "sensitivity_maps": (rng.standard_normal((b, c, h, w, 2)) / np.sqrt(c)).astype(np.float32),
        "mask": np.ones((b, 1, h, w), np.float32),
        "target": rng.standard_normal((b, h, w, 2)).astype(np.float32),
    }
    dev_batch = trainer._device_batch(batch)
    trainer.init_state(jax.random.PRNGKey(0), dev_batch)

    def digest(tree):
        return float(sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(tree)))

    if phase == "train":
        for _ in range(2):
            trainer.training_batch(batch)
        em.checkpointer.save(int(trainer.state.step), trainer.state, metrics={"val_loss": 1.0})
        em.checkpointer.save_last(trainer.state)
        print(f"TRAINED {pid} step={int(trainer.state.step)} digest={digest(trainer.state.params):.8f}", flush=True)
    else:
        resumed = em.maybe_resume(trainer)
        assert resumed, "resume found no checkpoint"
        assert int(trainer.state.step) == 2, int(trainer.state.step)
        print(f"RESUMED {pid} step={int(trainer.state.step)} digest={digest(trainer.state.params):.8f}", flush=True)
        # the resumed state must be immediately trainable on the mesh
        trainer.training_batch(batch)
        print(f"POSTSTEP {pid} step={int(trainer.state.step)}", flush=True)
    print(f"DONE {pid}", flush=True)


if __name__ == "__main__":
    main()
