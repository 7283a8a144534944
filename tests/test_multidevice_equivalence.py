"""n-device == 1-device numerics (VERDICT r4 #5).

The whole suite runs sharded on a forced 8-virtual-device CPU mesh, but
finiteness alone would not catch a cross-device numerics bug (a batch stat or
metric reduced with the wrong collective stays finite). These tests assert the
sharded step computes the SAME loss and the SAME gradients as the unsharded
one — the property the reference gets from torch DDP's allreduce semantics
(reference: mridc/utils/distributed.py + PTL DDP strategy) and we get from
XLA's sharding-propagated collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mridc_tpu.models import build_model
from mridc_tpu.parallel.mesh import make_mesh
from mridc_tpu.train.losses import process_reconstruction_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def _rv(x):
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def _recon_inputs(b=8, c=2, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64)
    sens = (rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))).astype(np.complex64)
    sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[..., ::3] = 1.0
    mask[..., w // 2 - 2 : w // 2 + 2] = 1.0
    target = (rng.standard_normal((b, h, w)) + 1j * rng.standard_normal((b, h, w))).astype(np.complex64)
    return jnp.asarray(_rv(y)), jnp.asarray(_rv(sens)), jnp.asarray(mask), jnp.asarray(_rv(target))


def _allclose_trees(a, b, rtol=1e-4, atol=1e-6, what="grads"):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        la, lb = np.asarray(la), np.asarray(lb)
        if not np.allclose(la, lb, rtol=rtol, atol=atol):
            err = np.abs(la - lb).max()
            raise AssertionError(f"{what} diverge at {jax.tree_util.keystr(path)}: max abs err {err}")


def test_recon_loss_and_grads_match_across_meshes():
    """CIRIM loss AND grads: 8-device batch-sharded step == single-device."""
    model = build_model(
        {
            "model_name": "CIRIM",
            "num_cascades": 2,
            "time_steps": 2,
            "recurrent_layer": "IndRNN",
            "conv_filters": [8, 8, 2],
            "conv_kernels": [5, 3, 3],
            "conv_dilations": [1, 2, 1],
            "recurrent_filters": [8, 8, 0],
            "recurrent_kernels": [1, 1, 0],
            "recurrent_dilations": [1, 1, 0],
            "fft_centered": True,
            "fft_normalization": "ortho",
        }
    )
    y, sens, mask, target = _recon_inputs()
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)
    params = variables["params"]

    def loss_fn(p, y, sens, mask, target):
        out = model.apply({"params": p}, y, sens, mask, train=True)
        return process_reconstruction_loss(out, target, "l1")

    grad_fn = jax.value_and_grad(loss_fn)

    # single device: everything on device 0
    d0 = jax.devices()[0]
    loss1, grads1 = jax.jit(grad_fn)(
        *(jax.device_put(x, d0) for x in (params, y, sens, mask, target))
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    repl, shard = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    loss8, grads8 = jax.jit(grad_fn, in_shardings=(repl, shard, shard, shard, shard))(
        jax.device_put(params, repl),
        *(jax.device_put(x, shard) for x in (y, sens, mask, target)),
    )

    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    _allclose_trees(grads1, grads8)


def test_seg_trainer_step_matches_across_meshes():
    """SegmentationTrainer: one SGD step on mesh(8) == mesh(1) — loss equal
    and param deltas (= -lr * grads, linear in the gradient) allclose."""
    from mridc_tpu.train.task_trainers import SegmentationTrainer

    rng = np.random.default_rng(3)
    b, h, w = 8, 16, 16
    batch = {
        "image": rng.standard_normal((b, h, w, 1)).astype(np.float32),
        "segmentation": np.eye(2, dtype=np.float32)[rng.integers(0, 2, (b, h, w))],
    }

    def run(n_dev):
        trainer = SegmentationTrainer(
            build_model(
                {
                    "model_name": "SegmentationUNet",
                    "segmentation_module_output_channels": 2,
                    "segmentation_module_channels": 4,
                    "segmentation_module_pooling_layers": 2,
                }
            ),
            optim_cfg={"name": "sgd", "lr": 0.1},
            mesh=make_mesh(n_dev),
        )
        trainer.setup_optimization()
        trainer.init_state(jax.random.PRNGKey(0), batch)
        before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        loss = float(trainer.training_batch(batch)["loss"])
        after = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        delta = jax.tree_util.tree_map(lambda a_, b_: a_ - b_, after, before)
        return loss, delta

    loss1, delta1 = run(1)
    loss8, delta8 = run(8)
    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    _allclose_trees(delta1, delta8, what="sgd param deltas")
