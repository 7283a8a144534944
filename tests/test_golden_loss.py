"""Golden parity of the SSDU / k-space reconstruction loss branch.

Runs the REFERENCE's own loss code (reconstruction/nn/base.py:107
``process_reconstruction_loss`` and the CIRIM accumulated variant,
nn/cirim.py:171) on an SSDU-style batch and checks our jittable
``mridc_tpu.train.losses.process_reconstruction_loss`` reproduces the value.

Pinned upstream bug: the reference calls a 3-arg ``utils.expand_op`` that is
never defined in ``common/parts/utils.py`` (its k-space branch would raise
AttributeError as shipped). The test injects the evident intent —
``complex_mul(x.unsqueeze(coil_dim), sens)``, matching the 2-arg quantitative
``expand_op`` (quantitative/nn/qrim/utils.py:37) — into the reference module
and our implementation mirrors that. Documented in PARITY.md.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax.numpy as jnp

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_base():
    base = reference_loader.load("mridc.collections.reconstruction.nn.base")
    # inject the missing expand_op (see module docstring)
    base.utils.expand_op = lambda x, s, dim: base.utils.complex_mul(x.unsqueeze(dim), s)
    return base


@pytest.fixture(scope="module")
def ref_cirim(ref_base):
    cirim = reference_loader.load("mridc.collections.reconstruction.nn.cirim")
    cirim.utils.expand_op = ref_base.utils.expand_op
    return cirim


def _ssdu_batch(b=1, c=4, h=16, w=16, seed=3):
    rng = np.random.default_rng(seed)
    target = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    pred = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    sens = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    sens /= np.sqrt((sens**2).sum(-1, keepdims=True).sum(1, keepdims=True)) + 1e-8
    loss_mask = (rng.random((b, 1, h, w, 1)) > 0.5).astype(np.float32)
    return target, pred, sens, loss_mask


class _Duck:
    """Duck-typed `self` for calling the reference loss methods unbound."""

    def __init__(self, **kw):
        self.kspace_reconstruction_loss = False
        self.unnormalize_loss_inputs = False
        self.ssdu = True
        self.n2r = False
        self.coil_dim = 1
        self.fft_centered = True
        self.fft_normalization = "ortho"
        self.spatial_dims = [-2, -1]
        self.reconstruction_loss_regularization_factor = 1.0
        self.__dict__.update(kw)


@pytest.mark.parametrize("loss_name", ["l1", "l2"])
@pytest.mark.parametrize("centered,norm", [(True, "ortho"), (False, "backward")])
def test_ssdu_kspace_loss_matches_reference(ref_base, loss_name, centered, norm):
    from mridc_tpu.models.base import ModelOutput
    from mridc_tpu.train.losses import process_reconstruction_loss

    target, pred, sens, loss_mask = _ssdu_batch()
    duck = _Duck(fft_centered=centered, fft_normalization=norm)
    loss_func = torch.nn.L1Loss() if loss_name == "l1" else torch.nn.MSELoss()
    want = ref_base.BaseMRIReconstructionModel.process_reconstruction_loss(
        duck,
        torch.from_numpy(target),
        torch.from_numpy(pred),
        torch.from_numpy(sens),
        torch.from_numpy(loss_mask),
        attrs={},
        r=0,
        loss_func=loss_func,
        # the reference enters its k-space branch only via this argument (or
        # the same-named config attr); ssdu alone stays in image domain —
        # verified against the actual reference code (see module docstring)
        kspace_reconstruction_loss=True,
    ).item()

    got = float(
        process_reconstruction_loss(
            ModelOutput(prediction=jnp.asarray(pred)),
            jnp.asarray(target),
            loss_name,
            1.0,
            loss_mask=jnp.asarray(loss_mask[:, 0, :, :, 0]),
            sensitivity_maps=jnp.asarray(sens),
            kspace_loss=True,
            fft_centered=centered,
            fft_normalization=norm,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_cirim_accumulated_kspace_loss_matches_reference(ref_cirim):
    """CIRIM logspace-weighted accumulated loss in k-space mode (cirim.py:330-363)."""
    from mridc_tpu.models.base import ModelOutput
    from mridc_tpu.train.losses import process_reconstruction_loss

    num_cascades, time_steps = 2, 5
    target, _, sens, loss_mask = _ssdu_batch()
    rng = np.random.default_rng(11)
    inter = rng.standard_normal((num_cascades, time_steps) + target.shape).astype(np.float32)

    duck = _Duck(
        accumulate_predictions=True,
        time_steps=time_steps,
        cirim=[None] * num_cascades,
    )
    preds = [[torch.from_numpy(inter[c, t]) for t in range(time_steps)] for c in range(num_cascades)]
    gen = ref_cirim.CIRIM.process_reconstruction_loss(
        duck,
        torch.from_numpy(target),
        preds,
        torch.from_numpy(sens),
        torch.from_numpy(loss_mask),
        attrs={},
        r=0,
        loss_func=torch.nn.L1Loss(),
        kspace_reconstruction_loss=True,
    )
    want = next(iter(gen)).item()

    got = float(
        process_reconstruction_loss(
            ModelOutput(prediction=jnp.asarray(inter[-1, -1]), intermediates=jnp.asarray(inter)),
            jnp.asarray(target),
            "l1",
            1.0,
            loss_mask=jnp.asarray(loss_mask[:, 0, :, :, 0]),
            sensitivity_maps=jnp.asarray(sens),
            kspace_loss=True,
            fft_centered=True,
            fft_normalization="ortho",
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_ssdu_alone_stays_image_domain(ref_base):
    """With ssdu=True but kspace_reconstruction_loss=False the reference trains
    plain normalized image magnitudes and never touches the loss mask — our
    image branch must match (and ignore loss_mask identically)."""
    from mridc_tpu.models.base import ModelOutput
    from mridc_tpu.train.losses import process_reconstruction_loss

    target, pred, sens, loss_mask = _ssdu_batch()
    duck = _Duck()
    # the reference's training_step converts target/preds to complex before the
    # loss (real_to_complex_tensor_or_list), making torch.abs a true magnitude
    want = ref_base.BaseMRIReconstructionModel.process_reconstruction_loss(
        duck,
        torch.view_as_complex(torch.from_numpy(target)),
        torch.view_as_complex(torch.from_numpy(pred)),
        torch.from_numpy(sens),
        torch.from_numpy(loss_mask),
        attrs={},
        r=0,
        loss_func=torch.nn.L1Loss(),
        kspace_reconstruction_loss=False,
    ).item()
    got = float(
        process_reconstruction_loss(
            ModelOutput(prediction=jnp.asarray(pred)),
            jnp.asarray(target),
            "l1",
            1.0,
            loss_mask=jnp.asarray(loss_mask[:, 0, :, :, 0]),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_kspace_loss_rejects_ssim():
    from mridc_tpu.models.base import ModelOutput
    from mridc_tpu.train.losses import process_reconstruction_loss

    target, pred, sens, _ = _ssdu_batch()
    with pytest.raises(ValueError, match="SSIM"):
        process_reconstruction_loss(
            ModelOutput(prediction=jnp.asarray(pred)),
            jnp.asarray(target),
            "ssim",
            sensitivity_maps=jnp.asarray(sens),
            kspace_loss=True,
        )


def test_n2r_loss_gating_exclusive():
    """With n2r predictions, the branches are EXCLUSIVE (reference
    nn/base.py:427-455): n2r_supervised selects the supervised term,
    otherwise ONLY the weighted consistency term trains."""
    import jax
    import jax.numpy as jnp

    from mridc_tpu.models import build_model
    from mridc_tpu.train.trainer import Trainer

    rng = np.random.default_rng(11)
    B, C, H, W = 1, 2, 16, 16

    def rv(s):
        return np.stack([rng.standard_normal(s), rng.standard_normal(s)], -1).astype(np.float32)

    model = build_model({"model_name": "UNet", "channels": 4, "pooling_layers": 2,
                         "fft_centered": True, "fft_normalization": "ortho"})
    trainer = Trainer(model, optim_cfg={"name": "adam", "lr": 1e-3},
                      trainer_cfg={"n2r_loss_weight": 0.5})
    batch = {
        "masked_kspace": rv((B, C, H, W)),
        "sensitivity_maps": rv((B, C, H, W)),
        "mask": np.ones((B, 1, H, W), np.float32),
        "target": rv((B, H, W)),
        # identical n2r inputs: the consistency term must be ~0 when the two
        # forwards see the same data (distinguishes it from the supervised term)
        "n2r_masked_kspace": None,  # filled below = masked_kspace
        "n2r_mask": np.ones((B, 1, H, W), np.float32),
        "attrs": [{"n2r_supervised": True}],
    }
    batch["n2r_masked_kspace"] = batch["masked_kspace"].copy()
    trainer.setup_optimization()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    # host copy: the donated train step deletes the device buffers
    params0 = jax.tree_util.tree_map(lambda x: np.array(x), trainer.state.params)

    def loss_for(supervised):
        # rebuild a fresh state so both branches evaluate the SAME params
        trainer.state = trainer.state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params0)
        )
        trainer._train_step = None
        b = dict(batch)
        b["attrs"] = [{"n2r_supervised": supervised}]
        m = trainer.training_batch(b)
        return float(m["loss"])

    loss_sup = loss_for(True)
    loss_cons = loss_for(False)
    # supervised branch compares against the target; consistency branch
    # compares the two predictions — different quantities, different values
    assert loss_sup != loss_cons
    # consistency of identical inputs (same y, same mask) with shared params
    # is ~0 x weight: the two forwards produce the same prediction
    assert loss_cons < 1e-5, loss_cons
    assert loss_sup > 1e-3, loss_sup
