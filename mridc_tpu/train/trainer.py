"""Training engine: jitted data-parallel train/eval steps + fit/validate/test loops.

Replaces the reference's PyTorch-Lightning ModelPT machinery
(reference: mridc/core/classes/modelPT.py:33 ``ModelPT``,
``setup_optimization`` :385, ``configure_optimizers`` :578;
mridc/collections/reconstruction/nn/base.py training/validation/test steps
:342-982) with a single explicit engine:

  - one jitted ``train_step``: forward + loss + grad + optax update, with the
    batch sharded over the mesh's ``data`` axis and params replicated — XLA
    inserts the gradient all-reduce over ICI (no DDP/NCCL plumbing).
  - magnitude/SSIM metrics stay on the host (exact skimage parity), fed by a
    jitted eval step that returns the normalized prediction.
  - EMA of params (reference: common/callbacks/ema.py:19) as a pytree average
    updated inside the jitted step.
"""

from __future__ import annotations

import signal
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from mridc_tpu.metrics.reconstruction import METRIC_FUNCS, ReconstructionMetrics
from mridc_tpu.models.base import ModelOutput
from mridc_tpu.parallel.mesh import make_mesh, shard_batch
from mridc_tpu.train.losses import process_reconstruction_loss
from mridc_tpu.train.optim import get_optimizer, parse_optimizer_args
from mridc_tpu.train.schedulers import ReduceLROnPlateau, prepare_lr_schedule
from mridc_tpu.utils.logging import get_logger

logger = get_logger()

__all__ = ["TrainState", "Trainer"]


def _host_val_loss(t: np.ndarray, p: np.ndarray, kind: str) -> float:
    """Validation loss in the family of the configured val_loss_fn (reference
    models compute val_loss with val_loss_fn, nn/base.py): l1 | l2/mse |
    ssim (as 1 - SSIM, the fastMRI SSIMLoss convention)."""
    if kind in ("l2", "mse"):
        return float(((t - p) ** 2).mean())
    if kind == "ssim":
        from mridc_tpu.metrics.reconstruction import ssim as _ssim

        return float(1.0 - _ssim(t, p))
    return float(np.abs(t - p).mean())


def _limit_batches(limit, loader):
    """PTL ``limit_{train,val}_batches`` semantics: float fraction of the
    loader length (when known) or an absolute batch count; None/1.0 = all."""
    if limit is None or loader is None:
        return None
    if isinstance(limit, bool):
        return None
    if isinstance(limit, float):
        if limit >= 1.0:
            return None
        try:
            n = len(loader)
        except TypeError:
            return None
        return max(1, int(np.ceil(limit * n)))
    limit = int(limit)
    return limit if limit >= 0 else None


def _host_mag(x: np.ndarray) -> np.ndarray:
    """Magnitude of a host array in any layout (complex, [..., 2] rv, or real)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return np.abs(x)
    if x.ndim >= 1 and x.shape[-1] == 2:
        return np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    return np.abs(x)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    # mutable model state (live BatchNorm running stats under the
    # train_batch_stats knob); None for the stateless majority of the zoo
    batch_stats: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, ema: bool = False, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # real copies, not aliases: params/ema_params must be distinct buffers
            # or donation in the jitted train step donates the same buffer twice
            ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
            batch_stats=batch_stats,
        )


def model_variables(params, batch_stats):
    """The variables dict for ``model.apply`` — batch_stats only when the
    model actually declares the collection (live BatchNorm)."""
    if batch_stats is None:
        return {"params": params}
    return {"params": params, "batch_stats": batch_stats}


def apply_with_stats(model, params, batch_stats, *args, **kwargs):
    """``model.apply`` that threads mutable batch_stats when present.

    Returns ``(out, new_batch_stats)``; for stateless models new_batch_stats
    is None. The ``None``-vs-tree distinction is static at trace time, so the
    jitted steps compile exactly as before for the stateless zoo.
    """
    if batch_stats is None:
        return model.apply({"params": params}, *args, **kwargs), None
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, *args, mutable=["batch_stats"], **kwargs
    )
    return out, mut["batch_stats"]


def dropout_rngs(step, salt: int = 0):
    """Per-step dropout rng dict for train-mode applies — deterministic in
    the global step (reference trains with live torch dropout; flax Dropout
    needs an explicit 'dropout' rng). Unused rng collections are ignored by
    dropout-free models, so every train step can pass this unconditionally."""
    return {"dropout": jax.random.fold_in(jax.random.PRNGKey(0x5eed), 2 * step + salt)}


class Trainer:
    """Task-agnostic trainer for reconstruction-style models.

    Parameters mirror the reference YAML ``trainer:``/``model.optim:`` blocks.
    """

    def __init__(
        self,
        model,
        optim_cfg: Optional[Dict] = None,
        trainer_cfg: Optional[Dict] = None,
        loss_type: str = "l1",
        val_loss_type: Optional[str] = None,
        mesh=None,
        use_ema: bool = False,
        ema_decay: float = 0.999,
        loss_regularization_factor: float = 1.0,
        exp_manager=None,
        ssdu: bool = False,
        kspace_reconstruction_loss: bool = False,
        log_images: bool = True,
        log_images_limit: int = 4,
    ):
        self.model = model
        self.optim_cfg = dict(optim_cfg or {"name": "adam", "lr": 1e-3})
        self.trainer_cfg = dict(trainer_cfg or {})
        self.loss_type = loss_type
        # reference models carry a separate val_loss_fn (usually = train's);
        # the monitored val_loss and plateau scheduling follow it
        self.val_loss_type = (val_loss_type or loss_type).lower()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.loss_regularization_factor = loss_regularization_factor
        self.exp_manager = exp_manager
        # SSDU / k-space reconstruction loss (reference nn/base.py:218-285):
        # either flag routes the loss through expand_op -> fft2 -> mask.
        self.ssdu = bool(ssdu)
        self.kspace_reconstruction_loss = bool(kspace_reconstruction_loss)
        # target/recon/|error| TB panels for the first N val batches
        # (reference logs per-batch panels when model.log_images is set,
        # reconstruction/nn/base.py:738-742)
        self.log_images = bool(log_images)
        self.log_images_limit = int(log_images_limit)
        self.schedule = None
        self.plateau = None
        self._tx = None
        self._train_step = None
        self._eval_step = None
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------ setup

    def setup_optimization(self, num_samples: int = 1, batch_size: int = 1):
        """Build optax chain + schedule (reference modelPT.setup_optimization :385)."""
        name = self.optim_cfg.get("name", "adam")
        lr = self.optim_cfg.get("lr", 1e-3)
        sched = prepare_lr_schedule(self.optim_cfg, num_samples, batch_size, self.trainer_cfg)
        if isinstance(sched, ReduceLROnPlateau):
            if self.plateau is None:
                self.plateau = sched
            # else: keep the live plateau (setup_optimization is re-run after
            # an LR drop to re-trace the step — replacing it would reset the
            # reduced lr and the patience bookkeeping)
            self.schedule = None
            lr_or_sched = lambda step: self.plateau.lr  # noqa: E731 — re-built each fit step below
        else:
            self.schedule = sched
            lr_or_sched = (lambda s: jnp.asarray(sched(s))) if sched is not None else lr
        kwargs = parse_optimizer_args(self.optim_cfg)
        tx = get_optimizer(name, lr_or_sched, **kwargs)
        clip = self.trainer_cfg.get("gradient_clip_val", 0)
        if clip:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        accum = self.trainer_cfg.get("accumulate_grad_batches", 1)
        if accum and accum > 1:
            # gradient accumulation (reference trainer.accumulate_grad_batches)
            tx = optax.MultiSteps(tx, every_k_schedule=int(accum))
        self._tx = tx
        return tx

    def init_state(self, rng, sample_batch: Dict) -> TrainState:
        y, sens, mask, init_pred = self._model_inputs(sample_batch)
        variables = self.model.init(rng, y, sens, mask, init_pred)
        params = variables["params"] if "params" in variables else FrozenDict()
        if self._tx is None:
            self.setup_optimization()
        self.state = TrainState.create(
            params, self._tx, ema=self.use_ema, batch_stats=variables.get("batch_stats")
        )
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info(f"Initialized model with {n_params:,} parameters on mesh {dict(self.mesh.shape)}")
        return self.state

    @staticmethod
    def _fold_slices(x):
        """[B, S, C, H, W, 2] consecutive-slice batches fold S into B (the
        reference folds slices into batch inside the model,
        rim_block.py:197-211; here it happens once at the step boundary)."""
        if x is not None and x.ndim == 6:
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
        return x

    @staticmethod
    def _num_slices(batch: Dict) -> int:
        """Consecutive-slice count S when batches are [B, S, C, H, W, 2]."""
        y = batch["masked_kspace"]
        return int(y.shape[1]) if getattr(y, "ndim", 0) == 6 else 1

    @staticmethod
    def _model_inputs(batch: Dict):
        slices = Trainer._num_slices(batch)
        y = Trainer._fold_slices(jnp.asarray(batch["masked_kspace"]))
        sens = Trainer._fold_slices(jnp.asarray(batch["sensitivity_maps"]))
        mask = jnp.asarray(batch["mask"])
        if mask.ndim == 5 and mask.shape[1] == 2:  # SSDU [B, 2, 1, H, W]: train mask
            mask = mask[:, 0]
        if slices > 1 and mask.shape[0] * slices == y.shape[0]:
            mask = jnp.repeat(mask, slices, axis=0)  # same mask for each slice
        init_pred = jnp.asarray(batch["initial_prediction"]) if "initial_prediction" in batch else None
        if init_pred is not None and slices > 1 and init_pred.ndim == 5:
            init_pred = init_pred.reshape((-1,) + init_pred.shape[2:])
        return y, sens, mask, init_pred

    # ------------------------------------------------------------- jitted fns

    def _optimizer_tail(self) -> Callable:
        """Shared optax update + EMA tail for every jitted train step.

        Task trainers that override ``_build_train_step`` MUST use this so the
        EMA update (reference common/callbacks/ema.py:19) is applied uniformly;
        round-2 overrides that skipped it silently validated against frozen
        initial weights when ``use_ema`` was on.
        """
        tx = self._tx
        use_ema = self.use_ema
        ema_decay = self.ema_decay

        def tail(state: TrainState, grads):
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = state.ema_params
            if use_ema and ema_params is not None:
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema_params, params
                )
            return state.replace(
                step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema_params
            )

        return tail

    def _build_train_step(self) -> Callable:
        model = self.model
        loss_type = self.loss_type
        reg = self.loss_regularization_factor
        tail = self._optimizer_tail()

        n2r_weight = self.trainer_cfg.get("n2r_loss_weight", 1.0)
        fft_centered = bool(getattr(model, "fft_centered", False))
        fft_normalization = str(getattr(model, "fft_normalization", "backward"))

        def train_step(
            state: TrainState, y, sens, mask, init_pred, target, loss_mask,
            n2r_y=None, n2r_mask=None, n2r_supervised=None,
        ):
            # Reference gating (nn/base.py:427-455): with n2r predictions the
            # branches are EXCLUSIVE — (ssdu or attrs['n2r_supervised']) picks
            # the (pseudo-)supervised term with kspace_loss=ssdu; otherwise
            # ONLY the n2r consistency term trains (with loss_mask and the
            # configured kspace gating, gradients flowing through both
            # predictions). Without n2r, the plain supervised loss runs.
            kspace_sup = self.kspace_reconstruction_loss or (self.ssdu and n2r_y is not None)

            def loss_fn(params, bs):
                out, bs = apply_with_stats(
                    model, params, bs, y, sens, mask, init_pred, train=True,
                    rngs=dropout_rngs(state.step),
                )
                loss_sup = process_reconstruction_loss(
                    out,
                    target,
                    loss_type,
                    reg,
                    loss_mask,
                    sensitivity_maps=sens,
                    kspace_loss=kspace_sup,
                    fft_centered=fft_centered,
                    fft_normalization=fft_normalization,
                )
                if n2r_y is None:
                    return loss_sup, bs
                out_n, bs = apply_with_stats(
                    model, params, bs, n2r_y, sens, n2r_mask, init_pred, train=True,
                    rngs=dropout_rngs(state.step, salt=1),
                )
                loss_cons = n2r_weight * process_reconstruction_loss(
                    ModelOutput(prediction=out_n.prediction),
                    out.prediction,
                    loss_type,
                    reg,
                    loss_mask,
                    sensitivity_maps=sens,
                    kspace_loss=self.kspace_reconstruction_loss,
                    fft_centered=fft_centered,
                    fft_normalization=fft_normalization,
                )
                if self.ssdu:
                    return loss_sup, bs  # pseudo-supervised branch always wins
                sup = n2r_supervised if n2r_supervised is not None else jnp.asarray(False)
                return jnp.where(sup, loss_sup, loss_cons), bs

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats
            )
            new_state = tail(state, grads).replace(batch_stats=new_bs)
            gnorm = optax.global_norm(grads)
            return new_state, {"loss": loss, "grad_norm": gnorm}

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self) -> Callable:
        model = self.model

        def eval_step(params, batch_stats, y, sens, mask, init_pred):
            out = model.apply(model_variables(params, batch_stats), y, sens, mask, init_pred, train=False)
            return out.prediction

        return jax.jit(eval_step)

    # ------------------------------------------------------------------ loops

    def _device_batch(self, batch: Dict) -> Dict:
        return shard_batch(batch, self.mesh)

    def training_batch(self, batch: Dict):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        b = self._device_batch(batch)
        slices = self._num_slices(b)
        y, sens, mask, init_pred = self._model_inputs(b)
        target = jnp.asarray(b["target"])
        if slices > 1 and target.ndim == 5:
            target = target.reshape((-1,) + target.shape[2:])
        loss_mask = None
        raw_mask = jnp.asarray(b["mask"])
        if raw_mask.ndim >= 4 and raw_mask.shape[1] == 2:  # SSDU loss mask
            loss_mask = raw_mask[:, 1, 0] if raw_mask.ndim == 5 else raw_mask[:, 1]
            if slices > 1 and loss_mask.shape[0] * slices == y.shape[0]:
                loss_mask = jnp.repeat(loss_mask, slices, axis=0)
        n2r_y = jnp.asarray(b["n2r_masked_kspace"]) if "n2r_masked_kspace" in b else None
        n2r_mask = jnp.asarray(b["n2r_mask"]) if "n2r_mask" in b else None
        # reference gates the n2r branches on attrs['n2r_supervised'] (one
        # flag per batch; any-supervised selects the supervised term)
        n2r_sup = None
        if n2r_y is not None:
            attrs = batch.get("attrs") or []
            n2r_sup = jnp.asarray(any(bool(a.get("n2r_supervised", False)) for a in attrs))
        self.state, metrics = self._train_step(
            self.state, y, sens, mask, init_pred, target, loss_mask, n2r_y, n2r_mask, n2r_sup
        )
        return metrics

    def predict_batch(self, batch: Dict, use_ema: bool = False) -> np.ndarray:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        b = self._device_batch(batch)
        y, sens, mask, init_pred = self._model_inputs(b)
        params = self.state.ema_params if (use_ema and self.state.ema_params is not None) else self.state.params
        pred = self._eval_step(params, self.state.batch_stats, y, sens, mask, init_pred)
        return np.asarray(pred)

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        max_epochs: Optional[int] = None,
        log_every_n_steps: int = 10,
        rng: Optional[jax.Array] = None,
    ):
        max_epochs = max_epochs or self.trainer_cfg.get("max_epochs", 1)
        ms = self.trainer_cfg.get("max_steps")
        max_steps = float("inf") if ms is None or float(ms) < 0 else float(ms)
        # PTL max_steps counts OPTIMIZER steps; the loop counts micro-batches,
        # so scale by the accumulation factor
        accum = max(1, int(self.trainer_cfg.get("accumulate_grad_batches", 1) or 1))
        max_micro_steps = max_steps * accum
        # PTL-compatible knobs (reference core/conf/trainer.py TrainerConfig)
        log_every_n_steps = int(self.trainer_cfg.get("log_every_n_steps", log_every_n_steps))
        check_val_every = int(self.trainer_cfg.get("check_val_every_n_epoch", 1) or 1)
        limit_train = _limit_batches(self.trainer_cfg.get("limit_train_batches", 1.0), train_loader)
        limit_val = _limit_batches(self.trainer_cfg.get("limit_val_batches", 1.0), val_loader)
        sanity_steps = int(self.trainer_cfg.get("num_sanity_val_steps", 0) or 0)
        val_interval_steps = None
        vci = self.trainer_cfg.get("val_check_interval")
        if vci is not None:
            if isinstance(vci, float) and vci < 1.0:
                try:
                    n_batches = len(train_loader)
                    val_interval_steps = max(1, int(round(vci * n_batches)))
                except TypeError:
                    val_interval_steps = None
            elif int(vci) >= 1:
                val_interval_steps = int(vci)

        if self._tx is None:
            self.setup_optimization(num_samples=len(getattr(train_loader, "dataset", [])) or 1,
                                    batch_size=getattr(train_loader, "batch_size", 1))
        if self.state is None:
            first = next(iter(train_loader))
            self.init_state(rng if rng is not None else jax.random.PRNGKey(0), self._device_batch(first))

        step = int(self.state.step)
        history = []

        if sanity_steps and val_loader is not None:
            # reference num_sanity_val_steps: run a few val batches before
            # training to fail fast on broken eval paths
            sanity = self.validate(val_loader, limit=sanity_steps)
            logger.info(
                "sanity check: " + " ".join(f"{k}={v:.5f}" for k, v in sanity.items() if isinstance(v, float))
            )

        # preemption-aware save: on SIGTERM (TPU maintenance / SLURM requeue)
        # checkpoint the current state before exiting so resume_if_exists can
        # pick the run back up (reference relies on exp_manager resume +
        # StatelessTimer, exp_manager.py:401-471/:991-1000; on TPU we hook the
        # signal directly).
        preempted = {"flag": False}
        prev_handler = None

        def _on_sigterm(signum, frame):  # noqa: ARG001
            preempted["flag"] = True
            logger.warning("SIGTERM received: checkpointing before exit")

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            prev_handler = None  # not in the main thread; skip the hook

        # profiling (reference step-timing via NamedTimer, utils/timers.py:14;
        # here additionally a real device trace): trainer.profile_dir captures
        # steps [profile_start_step, +profile_steps) as a TensorBoard-readable
        # XPlane trace
        profile_dir = self.trainer_cfg.get("profile_dir")
        profile_start = int(self.trainer_cfg.get("profile_start_step", 3))
        profile_len = int(self.trainer_cfg.get("profile_steps", 5))
        profiling = False

        try:
            for epoch in range(max_epochs):
                epoch_start = time.perf_counter()
                losses = []
                for batch_idx, batch in enumerate(train_loader):
                    if step >= max_micro_steps:
                        break
                    if limit_train is not None and batch_idx >= limit_train:
                        break
                    if profile_dir is not None:
                        if not profiling and step == profile_start:
                            jax.profiler.start_trace(str(profile_dir))
                            profiling = True
                        elif profiling and step >= profile_start + profile_len:
                            jax.profiler.stop_trace()
                            profiling = False
                            logger.info(f"Wrote profiler trace to {profile_dir}")
                    t0 = time.perf_counter()
                    metrics = self.training_batch(batch)
                    # keep the loss on device: a float() here would sync the host
                    # with the TPU every step and serialize input pipeline/compute
                    losses.append(metrics["loss"])
                    step += 1
                    if step % log_every_n_steps == 0:
                        loss = float(metrics["loss"])
                        dt = time.perf_counter() - t0
                        logger.info(f"epoch {epoch} step {step} loss {loss:.5f} step_time {dt:.3f}s")
                        if self.exp_manager is not None:
                            self.exp_manager.log_scalar("train_loss", loss, step)
                    if val_interval_steps and val_loader is not None and step % val_interval_steps == 0:
                        val = self._run_validation(val_loader, step, limit_val)
                        logger.info(
                            f"step {step} validation: "
                            + " ".join(f"{k}={v:.5f}" for k, v in val.items() if isinstance(v, float))
                        )
                    if step >= max_micro_steps or preempted["flag"]:
                        break
                if preempted["flag"]:
                    if self.exp_manager is not None:
                        # unmanaged "last": a metric-less save must not enter the
                        # monitored top-k bookkeeping
                        self.exp_manager.checkpointer.save_last(self.state)
                    break
                epoch_metrics = {
                    "epoch": epoch,
                    "train_loss": float(np.mean(jax.device_get(losses))) if losses else float("nan"),
                }
                if val_loader is not None and (epoch + 1) % check_val_every == 0:
                    val = self._run_validation(val_loader, step, limit_val)
                    epoch_metrics.update(val)
                logger.info(
                    f"epoch {epoch} done in {time.perf_counter() - epoch_start:.1f}s: "
                    + " ".join(f"{k}={v:.5f}" for k, v in epoch_metrics.items() if isinstance(v, float))
                )
                history.append(epoch_metrics)
                if step >= max_micro_steps:
                    break
        finally:
            if profiling:
                jax.profiler.stop_trace()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            if self.exp_manager is not None:
                self.exp_manager.on_train_end(self)
        return history

    def _run_validation(self, val_loader, step, limit_val=None) -> Dict[str, float]:
        """Validate + plateau-scheduler update + exp-manager hooks (shared by
        epoch-end and mid-epoch ``val_check_interval`` validation)."""
        val = self.validate(val_loader, limit=limit_val)
        if self.plateau is not None:
            old_lr = self.plateau.lr
            self.plateau.update(val["val_loss"])
            if self.plateau.lr != old_lr:
                # the jitted step baked the old lr in as a constant —
                # rebuild the optimizer chain and step at the new lr
                logger.info(f"ReduceLROnPlateau: lr {old_lr:.2e} -> {self.plateau.lr:.2e}")
                opt_state = self.state.opt_state
                self.setup_optimization()
                self.state = self.state.replace(opt_state=opt_state)
                self._train_step = None
        if self.exp_manager is not None:
            self.exp_manager.on_validation_end(self, val, step)
        return val

    def _maybe_log_val_images(self, batch_idx: int, target_mag: np.ndarray, pred_mag: np.ndarray):
        """Log target/recon/|error| panels for the first ``log_images_limit``
        validation batches (reference reconstruction/nn/base.py:738-742 logs
        per-batch panels when the model's ``log_images`` flag is set)."""
        if (
            self.exp_manager is None
            or not self.log_images
            or batch_idx >= self.log_images_limit
        ):
            return
        step = int(self.state.step) if self.state is not None else 0
        for i in range(min(target_mag.shape[0], 2)):
            t, p = target_mag[i], pred_mag[i]
            while t.ndim > 2:  # consecutive-slice volumes: log the middle slice
                t, p = t[t.shape[0] // 2], p[p.shape[0] // 2]
            self.exp_manager.log_image_triplet(f"val/batch{batch_idx}_{i}", t, p, step)

    def validate(
        self, val_loader: Iterable, use_ema: Optional[bool] = None, limit: Optional[int] = None
    ) -> Dict[str, float]:
        """Host-side metric computation at skimage parity (reference
        validation_epoch_end nn/base.py:857-913).

        When EMA is enabled the averaged weights are evaluated — mirroring the
        reference EMA callback's weight swap for val/test
        (common/callbacks/ema.py:19) — so checkpoint best-metric selection is
        driven by the EMA model.
        """
        use_ema = self.use_ema if use_ema is None else use_ema
        losses = []
        metrics = ReconstructionMetrics(METRIC_FUNCS)
        for batch_idx, batch in enumerate(val_loader):
            if limit is not None and batch_idx >= limit:
                break
            pred = self.predict_batch(batch, use_ema=use_ema)
            target = np.asarray(batch["target"])
            t = _host_mag(target)
            p = _host_mag(pred)
            tmax = t.max() or 1.0
            t = t / tmax
            p = p / (p.max() or 1.0)
            losses.append(_host_val_loss(t, p, self.val_loss_type))
            self._maybe_log_val_images(batch_idx, t, p)
            for i in range(t.shape[0]):
                metrics.push(t[i : i + 1], p[i : i + 1])
        # cross-process reduction (reference DistributedMetricSum sums metric
        # values and counts over DDP workers, nn/base.py:890-913); identity on
        # a single process
        from mridc_tpu.parallel.multihost import reduce_mean_stats

        sums = {"loss": float(np.sum(losses))}
        counts = {"loss": float(len(losses))}
        for k, stat in metrics.metrics_scores.items():
            sums[k] = stat.mean() * stat.n
            counts[k] = float(stat.n)
        reduced = reduce_mean_stats(sums, counts)
        out = {"val_loss": reduced.pop("loss")}
        out.update({f"val_{k}": float(v) for k, v in reduced.items()})
        return out

    def test(self, test_loader: Iterable, use_ema: Optional[bool] = None):
        """Per-volume reconstructions + metrics (reference test_epoch_end
        nn/base.py:915-982). EMA weights are used when EMA is enabled
        (reference EMA callback weight swap)."""
        use_ema = self.use_ema if use_ema is None else use_ema
        volumes: Dict[str, list] = {}
        targets: Dict[str, list] = {}
        for batch in test_loader:
            pred = self.predict_batch(batch, use_ema=use_ema)
            for i, fname in enumerate(batch["fname"]):
                volumes.setdefault(fname, []).append((int(batch["slice_idx"][i]), _host_mag(pred[i])))
                targets.setdefault(fname, []).append(
                    (int(batch["slice_idx"][i]), _host_mag(np.asarray(batch["target"][i])))
                )
        recons = {}
        metrics = ReconstructionMetrics(METRIC_FUNCS)
        for fname, slices in volumes.items():
            vol = np.stack([s for _, s in sorted(slices, key=lambda x: x[0])])
            tgt = np.stack([s for _, s in sorted(targets[fname], key=lambda x: x[0])])
            vol = vol / (vol.max() or 1.0)
            tgt = tgt / (tgt.max() or 1.0)
            recons[fname] = vol
            metrics.push(tgt, vol)
        from mridc_tpu.parallel.multihost import reduce_mean_stats

        sums = {k: s.mean() * s.n for k, s in metrics.metrics_scores.items()}
        counts = {k: float(s.n) for k, s in metrics.metrics_scores.items()}
        return recons, reduce_mean_stats(sums, counts)
