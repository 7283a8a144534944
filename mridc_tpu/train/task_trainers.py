"""Task-specific trainers: segmentation and joint recon+segmentation.

Plays the role of the reference's task base classes' training/validation steps
(reference: mridc/collections/segmentation/nn/base.py:27
``BaseMRISegmentationModel`` — CE+Dice loss dict, dice metrics;
mridc/collections/multitask/rs/nn/base.py:30
``BaseMRIReconstructionSegmentationModel`` — recon loss + weighted seg losses).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mridc_tpu.losses.segmentation import cross_entropy_loss, dice_loss
from mridc_tpu.metrics.segmentation import SegmentationMetrics
from mridc_tpu.train.losses import process_reconstruction_loss
from mridc_tpu.train.trainer import Trainer, _host_mag

__all__ = [
    "SegmentationTrainer",
    "MultitaskTrainer",
    "QuantitativeTrainer",
    "segmentation_loss_fn",
    "seg_loss_cfg_from_model_cfg",
    "quantitative_loss_fn",
    "parse_loss_regularization_factors",
]


def segmentation_loss_fn(
    target: jnp.ndarray,
    logits: jnp.ndarray,
    use_ce: bool = True,
    use_dice: bool = True,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    dice_kwargs: Optional[Dict] = None,
    ce_kwargs: Optional[Dict] = None,
    detach_ce: bool = True,
) -> jnp.ndarray:
    """Weighted CE + Dice combo (reference seg base ``process_segmentation_loss``,
    segmentation/nn/base.py:147-178; rs/nn/base.py:373-403).

    ``detach_ce=True`` pins the reference quirk that CE is evaluated on
    ``prediction.detach().cpu()`` — the CE term contributes to the reported
    loss value but NEVER backprops; only Dice drives gradients (PARITY.md).

    ``logits`` may carry a leading stack axis (per-cascade predictions, e.g.
    SegNet): each term is then averaged over the stack before weighting
    (reference segnet.py:213-251).
    """
    if use_ce and not use_dice and detach_ce:
        raise ValueError(
            "segmentation_loss_fn: cross-entropy-only with detach_ce=True has "
            "ZERO gradient everywhere (the reference's CE is computed detached "
            "and only Dice trains) — pass detach_ce=False or enable dice"
        )
    stacked = logits.ndim == target.ndim + 1
    preds = logits if stacked else logits[None]
    loss = 0.0
    if use_ce:
        labels = target.argmax(-1)
        ce_in = jax.lax.stop_gradient(preds) if detach_ce else preds
        ce = jnp.mean(
            jnp.stack([cross_entropy_loss(labels, ce_in[i], **(ce_kwargs or {})) for i in range(preds.shape[0])])
        )
        loss = loss + ce_weight * ce
    if use_dice:
        # fallback = reference defaults (rs/nn/base.py:94-108), identical to
        # seg_loss_cfg_from_model_cfg on an empty cfg — so configured and
        # unconfigured callers compute the same loss
        kw = dict(include_background=False, softmax=False, sigmoid=True, batch=False)
        kw.update(dice_kwargs or {})
        dl = jnp.mean(jnp.stack([dice_loss(target, preds[i], **kw)[1] for i in range(preds.shape[0])]))
        loss = loss + dice_weight * dl
    return loss


def seg_loss_cfg_from_model_cfg(model_cfg: Dict) -> Dict:
    """Translate the reference YAML segmentation-loss keys
    (``segmentation_loss_fn``, ``cross_entropy_loss_*``, ``dice_loss_*`` —
    rs/nn/base.py:76-110) into ``segmentation_loss_fn`` kwargs."""
    fns = model_cfg.get("segmentation_loss_fn", ["cross_entropy", "dice"])
    if isinstance(fns, str):
        fns = [fns]
    fns = list(fns or [])
    ce_w = model_cfg.get("cross_entropy_loss_weight")
    dice_kwargs = dict(
        include_background=bool(model_cfg.get("dice_loss_include_background", False)),
        to_onehot_y=bool(model_cfg.get("dice_loss_to_onehot_y", False)),
        sigmoid=bool(model_cfg.get("dice_loss_sigmoid", True)),
        softmax=bool(model_cfg.get("dice_loss_softmax", False)),
        squared_pred=bool(model_cfg.get("dice_loss_squared_pred", False)),
        jaccard=bool(model_cfg.get("dice_loss_jaccard", False)),
        smooth_nr=float(model_cfg.get("dice_loss_smooth_nr", 1e-5)),
        smooth_dr=float(model_cfg.get("dice_loss_smooth_dr", 1e-5)),
        batch=bool(model_cfg.get("dice_loss_batch", False)),
    )
    if ce_w in (None, "none", "None"):
        ce_w = None
    elif not isinstance(ce_w, (list, tuple)):
        ce_w = [float(ce_w)]  # reference torch.tensor() accepts scalars
    else:
        ce_w = list(ce_w)
    ce_kwargs = dict(
        label_smoothing=float(model_cfg.get("cross_entropy_loss_label_smoothing", 0.0)),
        weight=ce_w,
    )
    return dict(
        use_ce="cross_entropy" in fns,
        use_dice="dice" in fns,
        ce_weight=float(model_cfg.get("cross_entropy_loss_weighting_factor", 1.0)),
        dice_weight=float(model_cfg.get("dice_loss_weighting_factor", 1.0)),
        dice_kwargs=dice_kwargs,
        ce_kwargs=ce_kwargs,
    )


_QMAP_NAMES = ("R2star", "S0", "B0", "phi")


def parse_loss_regularization_factors(factors) -> jnp.ndarray:
    """Reference YAML format is a list of single-key dicts
    (``[{R2star: 3.0}, {S0: 1.0}, ...]`` — quantitative/nn/base.py:94-99);
    also accepts a flat dict, a 4-list of floats, or None (all ones)."""
    if factors is None:
        return jnp.ones(4, jnp.float32)
    if isinstance(factors, dict):
        return jnp.asarray([float(factors.get(n, 1.0)) for n in _QMAP_NAMES], jnp.float32)
    if isinstance(factors, (list, tuple)):
        if all(isinstance(f, dict) for f in factors):
            merged: Dict = {}
            for f in factors:
                merged.update(f)
            return jnp.asarray([float(merged.get(n, 1.0)) for n in _QMAP_NAMES], jnp.float32)
        return jnp.asarray([float(f) for f in factors], jnp.float32)
    return jnp.full((4,), float(factors), jnp.float32)


def quantitative_loss_fn(
    maps_target: jnp.ndarray,
    preds: jnp.ndarray,
    mask_brain: Optional[jnp.ndarray],
    factors: jnp.ndarray,
    loss_type: str = "ssim",
):
    """Reference quantitative training loss, accumulate-estimates semantics
    (``process_quantitative_loss`` quantitative/models/qcirim.py:343-399 +
    the training-step combination models/base.py:373-431,429-431):

    per (cascade c, time-step t, map q): normalize target and prediction each
    by their own global abs-max, multiply by |mask_brain|, compute l1/mse
    divided by ``factors[q]`` (ssim multiplied by it, with
    ``data_range = max|y| - min|y|`` of the normalized prediction); per-map
    total = sum_t/C then sum_c/C; final = mean over the 4 maps / 2.

    maps_target: [B, H, W, 4]; preds: [C, T, B, H, W, 4] (both unnormalized —
    gamma already reversed); mask_brain: [B, H, W] or None.
    Returns ``(total, per_map[4])``.
    """
    preds = jnp.asarray(preds)
    n_casc = preds.shape[0]
    if mask_brain is not None:
        m = jnp.abs(mask_brain).astype(preds.dtype)
    else:
        m = jnp.ones(maps_target.shape[:3], preds.dtype)
    xn = maps_target / jnp.maximum(jnp.abs(maps_target).max(axis=(0, 1, 2), keepdims=True), 1e-12)
    yn = preds / jnp.maximum(jnp.abs(preds).max(axis=(2, 3, 4), keepdims=True), 1e-12)
    xm = xn * m[..., None]  # [B, H, W, 4]
    ym = yn * m[None, None, ..., None]  # [C, T, B, H, W, 4]
    lt = str(loss_type).lower()
    if "ssim" in lt:
        from mridc_tpu.losses.ssim import ssim_loss

        dr = jnp.abs(yn).max(axis=(2, 3, 4)) - jnp.abs(yn).min(axis=(2, 3, 4))  # [C, T, 4]
        xq = jnp.moveaxis(xm, -1, 0)  # [4, B, H, W]
        yq = jnp.moveaxis(ym, -1, 2)  # [C, T, 4, B, H, W]

        def one_map(xx, yy, dd):
            return ssim_loss(xx, yy, jnp.broadcast_to(dd, (xx.shape[0],)))

        def per_ct(y_ct, d_ct):  # [4, B, H, W], [4]
            return jax.vmap(one_map)(xq, y_ct, d_ct)

        losses = jax.vmap(jax.vmap(per_ct))(yq, dr)  # [C, T, 4]
        losses = losses * factors[None, None, :]
    else:
        diff = xm[None, None] - ym
        if "mse" in lt or lt == "l2":
            per = (diff**2).mean(axis=(2, 3, 4))
        else:
            per = jnp.abs(diff).mean(axis=(2, 3, 4))
        losses = per / factors[None, None, :]
    per_map = losses.sum(axis=(0, 1)) / (n_casc * n_casc)
    total = per_map.mean() / 2.0
    return total, per_map


def quantitative_recon_loss_fn(target, recon_intermediates, loss_type: str = "l1"):
    """Reference qCIRIM per-echo reconstruction loss, accumulate path
    (``process_reconstruction_loss`` quantitative/models/qcirim.py:401-458,
    added to the quantitative loss at models/base.py:436-437):

    target (rv [B, E, H, W, 2]) is elementwise-abs'd and normalized by its
    global abs-max; each echo slice is re-normalized by its own abs-max; each
    time-step prediction is abs'd/normalized by its own abs-max; per
    (echo e, cascade c): ``sum_t l1(x_e, y_ect) * sum(logspace(-1,0,T)) / T``
    (the reference multiplies each scalar step loss by the whole logspace
    vector and sums — equivalent to this closed form); per echo ``sum_c / C``;
    total ``sum_e / E``.

    recon_intermediates: [E, C, T, B, H, W, 2]. Supports l1/mse (the
    reference's ssim branch feeds a [B, H, W, 2] real view into an
    NCHW-expecting SSIMLoss — shape-invalid upstream, pinned in PARITY.md).
    """
    import numpy as _np

    lt = str(loss_type).lower()
    if "ssim" in lt:
        raise ValueError(
            "quantitative reconstruction loss supports l1/mse only (the "
            "reference ssim branch is shape-invalid; see PARITY.md)"
        )
    e_dim, n_casc, t_steps = recon_intermediates.shape[:3]
    tgt = jnp.abs(target) / jnp.maximum(jnp.abs(target).max(), 1e-12)
    x = jnp.moveaxis(tgt, 1, 0)  # [E, B, H, W, 2]
    x = x / jnp.maximum(jnp.abs(x).max(axis=(1, 2, 3, 4), keepdims=True), 1e-12)
    y = jnp.abs(recon_intermediates)
    y = y / jnp.maximum(y.max(axis=(3, 4, 5, 6), keepdims=True), 1e-12)
    diff = x[:, None, None] - y  # [E, C, T, B, H, W, 2]
    if "mse" in lt or lt == "l2":
        per_ect = (diff**2).mean(axis=(3, 4, 5, 6))
    else:
        per_ect = jnp.abs(diff).mean(axis=(3, 4, 5, 6))
    w_sum = float(_np.sum(_np.logspace(-1, 0, t_steps)))
    per_ec = per_ect.sum(axis=2) * (w_sum / t_steps)  # [E, C]
    per_e = per_ec.sum(axis=1) / n_casc
    return per_e.sum() / e_dim


def _seg_pred_classes(logits: np.ndarray, thresholds=None) -> np.ndarray:
    """Validation binarization. With ``segmentation_classes_thresholds``
    configured, each class channel is thresholded independently (multi-hot —
    reference segmentation/nn/base.py:355-361); otherwise one-hot argmax."""
    if thresholds:
        thr = np.asarray(
            [0.5 if t in (None, "none", "None") else float(t) for t in thresholds], np.float32
        )
        return (logits > thr).astype(np.float32)
    return _tie_safe_onehot(logits)


def _tie_safe_onehot(logits: np.ndarray) -> np.ndarray:
    """One-hot of argmax — exactly one class per pixel even on exact logit
    ties (the round-2 ``logits == logits.max`` form produced multi-hot
    predictions on ties, inflating Dice denominators)."""
    return np.eye(logits.shape[-1], dtype=np.float32)[logits.argmax(-1)]


class SegmentationTrainer(Trainer):
    """Batches: {"image": [B, H, W, Cin], "segmentation": [B, H, W, classes]}."""

    def __init__(self, *args, seg_loss_cfg: Optional[Dict] = None,
                 segmentation_classes_thresholds=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.seg_loss_cfg = dict(seg_loss_cfg or {})
        self.segmentation_classes_thresholds = segmentation_classes_thresholds

    def _build_train_step(self):
        model = self.model
        tail = self._optimizer_tail()
        seg_cfg = self.seg_loss_cfg

        def train_step(state, image, target):
            def loss_fn(params, bs):
                from mridc_tpu.train.trainer import apply_with_stats, dropout_rngs

                out, bs = apply_with_stats(
                    model, params, bs, image, train=True, rngs=dropout_rngs(state.step)
                )
                logits = out[0] if isinstance(out, tuple) else out
                return segmentation_loss_fn(target, logits, **seg_cfg), bs

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats
            )
            new_state = tail(state, grads).replace(batch_stats=new_bs)
            return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch_stats, image):
            from mridc_tpu.train.trainer import model_variables

            out = model.apply(model_variables(params, batch_stats), image, train=False)
            return out[0] if isinstance(out, tuple) else out

        return jax.jit(eval_step)

    def init_state(self, rng, sample_batch):
        image = jnp.asarray(sample_batch["image"])
        variables = self.model.init(rng, image)
        params = variables["params"]
        if self._tx is None:
            self.setup_optimization()
        from mridc_tpu.train.trainer import TrainState

        self.state = TrainState.create(
            params, self._tx, ema=self.use_ema, batch_stats=variables.get("batch_stats")
        )
        return self.state

    def training_batch(self, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        b = self._device_batch(batch)
        self.state, metrics = self._train_step(self.state, jnp.asarray(b["image"]), jnp.asarray(b["segmentation"]))
        return metrics

    def predict_batch(self, batch, use_ema: bool = False):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        b = self._device_batch(batch)
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        return np.asarray(self._eval_step(params, self.state.batch_stats, jnp.asarray(b["image"])))

    def validate(self, val_loader: Iterable, use_ema=None, limit=None) -> Dict[str, float]:
        from mridc_tpu.parallel.multihost import reduce_mean_stats

        use_ema = self.use_ema if use_ema is None else use_ema
        metrics = SegmentationMetrics()
        dices, losses = [], []
        for batch_idx, batch in enumerate(val_loader):
            if limit is not None and batch_idx >= limit:
                break
            logits = self.predict_batch(batch, use_ema=use_ema)
            target = np.asarray(batch["segmentation"])
            losses.append(
                float(segmentation_loss_fn(jnp.asarray(target), jnp.asarray(logits), **self.seg_loss_cfg))
            )
            pred = _seg_pred_classes(logits, self.segmentation_classes_thresholds)
            for i in range(target.shape[0]):
                m = metrics(np.moveaxis(target[i], -1, 0), np.moveaxis(pred[i], -1, 0))
                dices.append(m["DICE"])
        reduced = reduce_mean_stats(
            {"loss": float(np.sum(losses)), "DICE": float(np.sum(dices))},
            {"loss": float(len(losses)), "DICE": float(len(dices))},
        )
        return {"val_loss": reduced["loss"], "val_DICE": reduced["DICE"]}


class MultitaskTrainer(Trainer):
    """Joint recon+seg training: total = w_rec * recon_loss + w_seg * (CE + Dice)
    (reference rs/nn/base.py:596-608 — ``total_reconstruction_loss_weight`` /
    ``total_segmentation_loss_weight``). Models that return a stacked
    per-cascade segmentation (SegNet, train mode) get the reference's
    per-cascade loss averaging (segnet.py:213-251) via ``segmentation_loss_fn``."""

    def __init__(
        self,
        *args,
        segmentation_loss_weight: float = 1.0,
        reconstruction_loss_weight: float = 1.0,
        seg_loss_cfg: Optional[Dict] = None,
        segmentation_classes_thresholds=None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.segmentation_loss_weight = segmentation_loss_weight
        self.reconstruction_loss_weight = reconstruction_loss_weight
        self.seg_loss_cfg = dict(seg_loss_cfg or {})
        self.segmentation_classes_thresholds = segmentation_classes_thresholds

    def _build_train_step(self):
        model = self.model
        tail = self._optimizer_tail()
        loss_type = self.loss_type
        seg_w = self.segmentation_loss_weight
        rec_w = self.reconstruction_loss_weight
        reg = self.loss_regularization_factor
        seg_cfg = self.seg_loss_cfg

        def train_step(state, y, sens, mask, init_pred, target, seg_target):
            def loss_fn(params, bs):
                from mridc_tpu.train.trainer import apply_with_stats, dropout_rngs

                (out, seg_logits), bs = apply_with_stats(
                    model, params, bs, y, sens, mask, init_pred, train=True,
                    rngs=dropout_rngs(state.step),
                )
                # reference rs/nn/base.py:371: recon loss x reconstruction_loss_regularization_factor
                recon = process_reconstruction_loss(out, target, loss_type, reg)
                seg = segmentation_loss_fn(seg_target, seg_logits, **seg_cfg)
                return rec_w * recon + seg_w * seg, (recon, seg, bs)

            (loss, (recon_l, seg_l, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats
            )
            new_state = tail(state, grads).replace(batch_stats=new_bs)
            return new_state, {"loss": loss, "recon_loss": recon_l, "seg_loss": seg_l,
                               "grad_norm": optax.global_norm(grads)}

        return jax.jit(train_step, donate_argnums=(0,))

    def training_batch(self, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        b = self._device_batch(batch)
        y, sens, mask, init_pred = self._model_inputs(b)
        self.state, metrics = self._train_step(
            self.state, y, sens, mask, init_pred, jnp.asarray(b["target"]), jnp.asarray(b["segmentation"])
        )
        return metrics

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch_stats, y, sens, mask, init_pred):
            from mridc_tpu.train.trainer import model_variables

            out, seg = model.apply(model_variables(params, batch_stats), y, sens, mask, init_pred, train=False)
            return out.prediction, seg

        return jax.jit(eval_step)

    def predict_batch(self, batch, use_ema: bool = False):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        b = self._device_batch(batch)
        y, sens, mask, init_pred = self._model_inputs(b)
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        pred, seg = self._eval_step(params, self.state.batch_stats, y, sens, mask, init_pred)
        return np.asarray(pred), np.asarray(seg)

    def validate(self, val_loader: Iterable, use_ema=None, limit=None) -> Dict[str, float]:
        from mridc_tpu.metrics.reconstruction import ssim
        from mridc_tpu.parallel.multihost import reduce_mean_stats

        use_ema = self.use_ema if use_ema is None else use_ema
        seg_metrics = SegmentationMetrics()
        losses, ssims, dices = [], [], []
        for batch_idx, batch in enumerate(val_loader):
            if limit is not None and batch_idx >= limit:
                break
            pred, seg_logits = self.predict_batch(batch, use_ema=use_ema)
            target = _host_mag(np.asarray(batch["target"]))
            p = _host_mag(pred)
            t = target / (target.max() or 1.0)
            p = p / (p.max() or 1.0)
            losses.append(float(np.abs(t - p).mean()))
            self._maybe_log_val_images(batch_idx, t, p)
            seg_target = np.asarray(batch["segmentation"])
            seg_pred = _seg_pred_classes(seg_logits, self.segmentation_classes_thresholds)
            for i in range(t.shape[0]):
                ssims.append(ssim(t[i : i + 1], p[i : i + 1]))
                dices.append(
                    seg_metrics(np.moveaxis(seg_target[i], -1, 0), np.moveaxis(seg_pred[i], -1, 0))["DICE"]
                )
        reduced = reduce_mean_stats(
            {"loss": float(np.sum(losses)), "SSIM": float(np.sum(ssims)), "DICE": float(np.sum(dices))},
            {"loss": float(len(losses)), "SSIM": float(len(ssims)), "DICE": float(len(dices))},
        )
        return {
            "val_loss": reduced["loss"],
            "val_SSIM": reduced["SSIM"],
            "val_DICE": reduced["DICE"],
        }


class QuantitativeTrainer(Trainer):
    """qMRI training with the reference's per-map regularized loss
    (``process_quantitative_loss`` quantitative/models/qcirim.py:343-399 via
    ``quantitative_loss_fn``): each map normalized by its own abs-max, gated by
    |mask_brain|, l1/mse divided (ssim multiplied) by the configured
    ``loss_regularization_factors``, accumulated over cascades/time-steps.

    Batches: {"kspace" [B, E, C, H, W, 2], "sensitivity_maps", "mask" [B,1,H,W],
    "maps_init" [B, H, W, 4], "maps_target" [B, H, W, 4], "TEs" [E],
    optional "mask_brain" [B, H, W]}.
    """

    def __init__(self, *args, loss_regularization_factors=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_regularization_factors = parse_loss_regularization_factors(loss_regularization_factors)
        self._val_recon_step = None

    def _unnormalized_preds(self, out):
        """[C, T, B, H, W, 4] unnormalized prediction stack: model
        intermediates are in gamma-normalized space (qcirim.py intermediates),
        the final prediction is already unnormalized."""
        if out.intermediates is not None and out.intermediates.ndim == out.prediction.ndim + 2:
            gamma = jnp.asarray(getattr(self.model, "gamma", (1.0, 1.0, 1.0, 1.0)), jnp.float32)
            return out.intermediates * gamma[None, None, None, None, None, :]
        return out.prediction[None, None]

    def _build_train_step(self):
        model = self.model
        tail = self._optimizer_tail()
        loss_type = self.loss_type
        factors = self.loss_regularization_factors
        unnorm = self._unnormalized_preds

        def train_step(state, y, sens, mask, maps_init, tes, maps_target, mask_brain, target_recon):
            def loss_fn(params):
                from mridc_tpu.train.trainer import dropout_rngs

                out = model.apply(
                    {"params": params}, y, sens, mask, maps_init, tes, train=True,
                    rngs=dropout_rngs(state.step),
                )
                total, _ = quantitative_loss_fn(maps_target, unnorm(out), mask_brain, factors, loss_type)
                # reference models/base.py:436-437: with use_reconstruction_
                # module the per-echo recon loss ADDS to the quantitative loss
                lossrecon = jnp.zeros(())
                if target_recon is not None and out.recon_intermediates is not None:
                    lossrecon = quantitative_recon_loss_fn(
                        target_recon, out.recon_intermediates, loss_type
                    )
                return total + lossrecon, lossrecon

            (loss, lossrecon), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state = tail(state, grads)
            return new_state, {
                "loss": loss, "recon_loss": lossrecon, "grad_norm": optax.global_norm(grads)
            }

        return jax.jit(train_step, donate_argnums=(0,))

    def init_state(self, rng, sample_batch):
        b = sample_batch
        variables = self.model.init(
            rng,
            jnp.asarray(b["kspace"]),
            jnp.asarray(b["sensitivity_maps"]),
            jnp.asarray(b["mask"]),
            jnp.asarray(b["maps_init"]),
            jnp.asarray(b["TEs"]),
        )
        if self._tx is None:
            self.setup_optimization()
        from mridc_tpu.train.trainer import TrainState

        self.state = TrainState.create(variables["params"], self._tx, ema=self.use_ema)
        return self.state

    def training_batch(self, batch):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        b = self._device_batch(batch)
        mask_brain = jnp.asarray(b["mask_brain"]) if "mask_brain" in b else None
        # per-echo recon target only matters when the model folds in a recon
        # module (reference use_reconstruction_module)
        target_recon = None
        if getattr(self.model, "use_reconstruction_module", False) and "target" in b:
            target_recon = jnp.asarray(b["target"])
        self.state, metrics = self._train_step(
            self.state,
            jnp.asarray(b["kspace"]),
            jnp.asarray(b["sensitivity_maps"]),
            jnp.asarray(b["mask"]),
            jnp.asarray(b["maps_init"]),
            jnp.asarray(b["TEs"]),
            jnp.asarray(b["maps_target"]),
            mask_brain,
            target_recon,
        )
        return metrics

    def predict_batch(self, batch, use_ema: bool = False):
        if self._eval_step is None:
            model = self.model

            def eval_step(params, y, sens, mask, maps_init, tes):
                return model.apply({"params": params}, y, sens, mask, maps_init, tes, train=False).prediction

            self._eval_step = jax.jit(eval_step)
        b = self._device_batch(batch)
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        return np.asarray(
            self._eval_step(
                params,
                jnp.asarray(b["kspace"]),
                jnp.asarray(b["sensitivity_maps"]),
                jnp.asarray(b["mask"]),
                jnp.asarray(b["maps_init"]),
                jnp.asarray(b["TEs"]),
            )
        )

    def _val_recon_loss(self, batch, params) -> Optional[float]:
        """lossrecon term for validation — the reference adds it to val_loss
        too (quantitative/models/base.py:568-618)."""
        if not getattr(self.model, "use_reconstruction_module", False) or "target" not in batch:
            return None
        if "ssim" in str(self.val_loss_type).lower():
            # the reference's ssim lossrecon branch is shape-invalid upstream
            # (PARITY.md) — quantitative_recon_loss_fn rejects it; skip the
            # term rather than fail validation
            return None
        if self._val_recon_step is None:
            model = self.model
            loss_type = self.val_loss_type

            def recon_loss(params, y, sens, mask, maps_init, tes, target):
                out = model.apply({"params": params}, y, sens, mask, maps_init, tes, train=False)
                if out.recon_intermediates is None:
                    return jnp.zeros(())
                return quantitative_recon_loss_fn(target, out.recon_intermediates, loss_type)

            self._val_recon_step = jax.jit(recon_loss)
        b = self._device_batch(batch)
        return float(
            self._val_recon_step(
                params,
                jnp.asarray(b["kspace"]),
                jnp.asarray(b["sensitivity_maps"]),
                jnp.asarray(b["mask"]),
                jnp.asarray(b["maps_init"]),
                jnp.asarray(b["TEs"]),
                jnp.asarray(b["target"]),
            )
        )

    def validate(self, val_loader: Iterable, use_ema=None, limit=None) -> Dict[str, float]:
        """Per-map normalized L1 + NMSE over R2*/S0/B0/phi (reference
        quantitative base logs per-map losses, quantitative/nn/base.py); with
        a folded reconstruction module, val_loss additionally carries the
        reference's lossrecon term (models/base.py:617-618)."""
        from mridc_tpu.parallel.multihost import reduce_mean_stats

        use_ema = self.use_ema if use_ema is None else use_ema
        names = ("R2star", "S0", "B0", "phi")
        sums = {"loss": 0.0, **{f"NMSE_{n}": 0.0 for n in names}}
        counts = {k: 0.0 for k in sums}
        for batch_idx, batch in enumerate(val_loader):
            if limit is not None and batch_idx >= limit:
                break
            pred = self.predict_batch(batch, use_ema=use_ema)
            target = np.asarray(batch["maps_target"])
            mask_brain = jnp.asarray(batch["mask_brain"]) if "mask_brain" in batch else None
            total, _ = quantitative_loss_fn(
                jnp.asarray(target),
                jnp.asarray(pred)[None, None],
                mask_brain,
                self.loss_regularization_factors,
                self.val_loss_type,
            )
            params = (
                self.state.ema_params
                if (use_ema and self.state.ema_params is not None)
                else self.state.params
            )
            lossrecon = self._val_recon_loss(batch, params)
            sums["loss"] += float(total) + (lossrecon or 0.0)
            counts["loss"] += 1.0
            for i, n in enumerate(names):
                t, p = target[..., i], pred[..., i]
                denom = float((t**2).sum()) or 1.0
                sums[f"NMSE_{n}"] += float(((p - t) ** 2).sum()) / denom
                counts[f"NMSE_{n}"] += 1.0
        reduced = reduce_mean_stats(sums, counts)
        out = {"val_loss": reduced.pop("loss")}
        out.update({f"val_{k}": float(v) for k, v in reduced.items()})
        return out
