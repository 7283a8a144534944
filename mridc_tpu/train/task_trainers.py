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

__all__ = ["SegmentationTrainer", "MultitaskTrainer", "QuantitativeTrainer", "segmentation_loss_fn"]


def segmentation_loss_fn(
    target: jnp.ndarray,
    logits: jnp.ndarray,
    use_ce: bool = True,
    use_dice: bool = True,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    dice_kwargs: Optional[Dict] = None,
) -> jnp.ndarray:
    """Weighted CE + Dice combo (reference seg base process_segmentation_loss)."""
    loss = 0.0
    if use_ce:
        labels = target.argmax(-1)
        loss = loss + ce_weight * cross_entropy_loss(labels, logits)
    if use_dice:
        kw = dict(include_background=False, softmax=True, sigmoid=False)
        kw.update(dice_kwargs or {})
        _, dl = dice_loss(target, logits, **kw)
        loss = loss + dice_weight * dl
    return loss


class SegmentationTrainer(Trainer):
    """Batches: {"image": [B, H, W, Cin], "segmentation": [B, H, W, classes]}."""

    def _build_train_step(self):
        model = self.model
        tx = self._tx

        def train_step(state, image, target):
            def loss_fn(params):
                out = model.apply({"params": params}, image, train=True)
                logits = out[0] if isinstance(out, tuple) else out
                return segmentation_loss_fn(target, logits)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
            return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, image):
            out = model.apply({"params": params}, image, train=False)
            return out[0] if isinstance(out, tuple) else out

        return jax.jit(eval_step)

    def init_state(self, rng, sample_batch):
        image = jnp.asarray(sample_batch["image"])
        variables = self.model.init(rng, image)
        params = variables["params"]
        if self._tx is None:
            self.setup_optimization()
        from mridc_tpu.train.trainer import TrainState

        self.state = TrainState.create(params, self._tx, ema=self.use_ema)
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
        return np.asarray(self._eval_step(params, jnp.asarray(b["image"])))

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
                float(segmentation_loss_fn(jnp.asarray(target), jnp.asarray(logits)))
            )
            pred = (logits == logits.max(-1, keepdims=True)).astype(np.float32)
            for i in range(target.shape[0]):
                m = metrics(np.moveaxis(target[i], -1, 0), np.moveaxis(pred[i], -1, 0))
                dices.append(m["DICE"])
        reduced = reduce_mean_stats(
            {"loss": float(np.sum(losses)), "DICE": float(np.sum(dices))},
            {"loss": float(len(losses)), "DICE": float(len(dices))},
        )
        return {"val_loss": reduced["loss"], "val_DICE": reduced["DICE"]}


class MultitaskTrainer(Trainer):
    """Joint recon+seg training: total = recon_loss + w * (CE + Dice)
    (reference multitask base :73-110)."""

    def __init__(self, *args, segmentation_loss_weight: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.segmentation_loss_weight = segmentation_loss_weight

    def _build_train_step(self):
        model = self.model
        tx = self._tx
        loss_type = self.loss_type
        seg_w = self.segmentation_loss_weight

        def train_step(state, y, sens, mask, init_pred, target, seg_target):
            def loss_fn(params):
                out, seg_logits = model.apply({"params": params}, y, sens, mask, init_pred, train=True)
                recon = process_reconstruction_loss(out, target, loss_type)
                seg = segmentation_loss_fn(seg_target, seg_logits)
                return recon + seg_w * seg, (recon, seg)

            (loss, (recon_l, seg_l)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
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

        def eval_step(params, y, sens, mask, init_pred):
            out, seg = model.apply({"params": params}, y, sens, mask, init_pred, train=False)
            return out.prediction, seg

        return jax.jit(eval_step)

    def predict_batch(self, batch, use_ema: bool = False):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        b = self._device_batch(batch)
        y, sens, mask, init_pred = self._model_inputs(b)
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        pred, seg = self._eval_step(params, y, sens, mask, init_pred)
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
            seg_target = np.asarray(batch["segmentation"])
            seg_pred = (seg_logits == seg_logits.max(-1, keepdims=True)).astype(np.float32)
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
    """qMRI training: logspace-weighted l1 over the 4 map channels, optionally
    gated by the brain mask (reference quantitative/nn/base.py:134
    ``process_quantitative_loss``).

    Batches: {"kspace" [B, E, C, H, W, 2], "sensitivity_maps", "mask" [B,1,H,W],
    "maps_init" [B, H, W, 4], "maps_target" [B, H, W, 4], "TEs" [E],
    optional "mask_brain" [B, H, W]}.
    """

    def _build_train_step(self):
        model = self.model
        tx = self._tx
        loss_type = self.loss_type

        def train_step(state, y, sens, mask, maps_init, tes, maps_target, mask_brain):
            def loss_fn(params):
                out = model.apply({"params": params}, y, sens, mask, maps_init, tes, train=True)
                pred = out.prediction
                target = maps_target
                if mask_brain is not None:
                    pred = pred * mask_brain[..., None]
                    target = target * mask_brain[..., None]
                # per-map normalization so R2*/B0 scales don't dominate
                scale = jnp.maximum(jnp.abs(target).max(axis=(0, 1, 2), keepdims=True), 1e-12)
                diff = (pred - target) / scale
                if str(loss_type).lower() in ("l2", "mse"):
                    return (diff**2).mean()
                return jnp.abs(diff).mean()

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
            return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

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
        self.state, metrics = self._train_step(
            self.state,
            jnp.asarray(b["kspace"]),
            jnp.asarray(b["sensitivity_maps"]),
            jnp.asarray(b["mask"]),
            jnp.asarray(b["maps_init"]),
            jnp.asarray(b["TEs"]),
            jnp.asarray(b["maps_target"]),
            mask_brain,
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

    def validate(self, val_loader: Iterable, use_ema=None, limit=None) -> Dict[str, float]:
        """Per-map normalized L1 + NMSE over R2*/S0/B0/phi (reference
        quantitative base logs per-map losses, quantitative/nn/base.py)."""
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
            scale = np.maximum(np.abs(target).max(axis=(0, 1, 2), keepdims=True), 1e-12)
            sums["loss"] += float(np.abs((pred - target) / scale).mean())
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
