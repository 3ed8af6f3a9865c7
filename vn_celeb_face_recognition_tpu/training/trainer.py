"""Config-driven training runtime (the reference's L4 layer, TPU-first).

Behavioural parity with /root/reference/trainer/base_trainer.py and
classification_trainer.py / online_aug_trainer.py:
  * timestamped run dirs under save_dir/{models,logs}/<run_id>;
  * MetricTracker-driven epoch logs, per-step log every ``log_step``;
  * best-metric monitoring (min/max) with early stop after ``patience``
    epochs without improvement, checkpoints every ``save_period`` plus
    ``model_best``;
  * ``track4plot`` CSV (Epoch,Train_loss,Validation_loss) in the log dir;
  * ReduceLROnPlateau stepped on the validation loss each epoch;
  * ``eval(save_result=True)`` dumping result.csv with
    Path/Target/Prediction/Probability rows;
  * AugClassificationTrainer holding a FROZEN encoder selected by
    ``chosen_idx_enc`` and running image -> augment -> encoder -> MLP
    online per step.

TPU redesign vs the reference's per-batch Python loop:
  * the entire step (transform/augment -> [encoder] -> model -> loss ->
    grad -> optimizer update -> metrics) is ONE jitted program; padding
    weights keep shapes static so it compiles exactly once;
  * augmentation runs on device (ops/augment), not in the Dataset;
  * with a multi-device mesh the batch is sharded over the 'data' axis
    and parameters are replicated — XLA inserts the gradient psum over
    ICI automatically (there is no NCCL-style process group to manage).
"""

import logging
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import (
    MetricTracker,
    append_log_to_file,
    create_folder,
    save_pandas_df,
    setup_logging,
)
from ..data.transforms import get_transform, with_resize
from .checkpoint import load_checkpoint, restore_variables, save_checkpoint
from .losses import LOSSES, METRICS
from .optim import (
    MultiStepLR,
    ReduceLROnPlateau,
    get_current_lr,
    make_lr_scheduler,
    make_optimizer,
    set_current_lr,
)


class BaseTrainer:
    def __init__(self, config, model, loss=None, metrics=None,
                 optimizer=None, lr_scheduler=None, mesh=None, seed=123):
        self.config = config
        self.model = model
        self.mesh = mesh
        self.loss_name = config["loss"]
        self.loss_fn = loss if loss is not None else LOSSES[self.loss_name]
        metric_names = config.get("metrics", [])
        if metrics is not None:
            self.metric_fns = {m.__name__: m for m in metrics}
        else:
            self.metric_fns = {m: METRICS[m] for m in metric_names}
        self.metric_names = list(self.metric_fns)

        self.optimizer = optimizer if optimizer is not None else \
            make_optimizer(config["optimizer"]["name"],
                           config["optimizer"]["args"])
        if lr_scheduler is not None:
            self.lr_scheduler = lr_scheduler
        elif "lr_scheduler" in config:
            self.lr_scheduler = make_lr_scheduler(
                config["lr_scheduler"]["name"],
                config["lr_scheduler"]["args"])
        else:
            self.lr_scheduler = None

        tcfg = config["trainer"]
        self.start_epoch = 1
        self.epochs = tcfg["epochs"]
        self.tracked_metric, self.mode_monitor = tcfg["tracked_metric"]
        self.early_stop = tcfg["patience"]
        self.save_step = tcfg["save_period"]
        self.log_step = tcfg["log_step"]
        self.do_val = tcfg["do_validation"]
        self.val_step = tcfg["validation_step"]

        self.train_loss = MetricTracker(self.loss_name)
        self.train_metrics = MetricTracker(*self.metric_names)
        self.val_loss = MetricTracker(self.loss_name)
        self.val_metrics = MetricTracker(*self.metric_names)
        self.test_loss = MetricTracker(self.loss_name)
        self.test_metrics = MetricTracker(*self.metric_names)

        save_dir = Path(tcfg["save_dir"])
        run_id = datetime.now().strftime(r"%m%d_%H%M%S")
        self.save_dir = save_dir / "models" / run_id
        self.log_dir = save_dir / "logs" / run_id
        create_folder(self.save_dir)
        create_folder(self.log_dir)
        setup_logging(self.log_dir)
        self.logger = logging.getLogger("trainer")

        self.mnt_best = np.inf if self.mode_monitor == "min" else -np.inf

        # transforms: device-side batched fns resolved by name
        self.train_transform, self.val_transform = self._build_transforms()

        # optional multi-device mesh: batches shard over 'data',
        # parameters replicate; XLA inserts the gradient psum over ICI
        if self.mesh is None and tcfg.get("n_devices", 1) > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(n_data=tcfg["n_devices"])
        self._data_sharding = None
        self._repl_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._repl_sharding = NamedSharding(self.mesh, P())

        self.rng = jax.random.PRNGKey(seed)
        self.variables = None
        self.opt_state = None
        self._pending_resume = None
        cp_path = tcfg.get("resume_path", "")
        if cp_path:
            self._pending_resume = cp_path

        self.train_loader = None
        self.val_loader = None
        self._jit_train_step = None
        self._jit_eval_step = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _build_transforms(self):
        tf_config = self.config.get("transforms", "none")
        if not isinstance(tf_config, dict):
            return None, None
        train_tf = get_transform(tf_config.get("name", "none"))
        val_tf = get_transform("default")
        if tf_config.get("resize"):
            size = tf_config["encoder_img_size"]
            if train_tf is not None:
                train_tf = with_resize(train_tf, size)
            val_tf = with_resize(val_tf, size)
        return train_tf, val_tf

    def setup_loader(self, train_loader, val_loader):
        self.train_loader = train_loader
        self.val_loader = val_loader

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _ensure_ready(self, batch):
        """Lazy init: variables from the first batch's shapes, optimizer
        state, pending checkpoint resume, and the jitted steps."""
        if self.variables is None:
            data = jnp.asarray(batch["data"])
            x = self._prepare_input(data, train=False,
                                    rng=jax.random.PRNGKey(0))
            x = self._encode(x)
            self.variables = self.model.init(
                {"params": self._next_rng()}, x, train=False
            )
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.variables["params"])
        if self._pending_resume:
            self.resume_checkpoint(self._pending_resume)
            self._pending_resume = None
        if self._jit_train_step is None:
            if self.mesh is not None and self._repl_sharding is not None:
                self.variables = jax.device_put(self.variables,
                                                self._repl_sharding)
                self.opt_state = jax.device_put(self.opt_state,
                                                self._repl_sharding)
            self._build_steps()

    def _prepare_input(self, data, train, rng):
        tf = self.train_transform if train else self.val_transform
        if tf is not None:
            return tf(data, rng)
        return data

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _encode(self, x):
        """Hook for trainers that run a frozen encoder before the model."""
        return x

    def _place_batch(self, arrays):
        """Shard batch arrays over the data axis when a mesh is set."""
        if self.mesh is None:
            return arrays
        from ..parallel import data_sharding

        return {
            k: jax.device_put(v, data_sharding(self.mesh, v.ndim))
            for k, v in arrays.items()
        }

    def _build_steps(self):
        if self._jit_train_step is not None:
            return
        model = self.model
        loss_fn = self.loss_fn
        metric_fns = self.metric_fns
        optimizer = self.optimizer
        has_batch_stats = "batch_stats" in self.variables

        def forward(variables, x, train, rng):
            kwargs = {"train": train}
            rngs = {"dropout": rng} if train else None
            if has_batch_stats and train:
                out, updates = model.apply(
                    variables, x, mutable=["batch_stats"], rngs=rngs,
                    **kwargs
                )
                return out, updates
            out = model.apply(variables, x, rngs=rngs, **kwargs)
            return out, {}

        def train_step(variables, opt_state, batch, rng):
            rng_tf, rng_do = jax.random.split(rng)
            x = self._prepare_input(jnp.asarray(batch["data"]), True, rng_tf)
            x = self._encode(x)
            target = batch["target"]
            weight = batch["weight"]

            def loss_of(params):
                vars_in = dict(variables, params=params)
                out, updates = forward(vars_in, x, True, rng_do)
                loss = loss_fn(out, target, weight)
                return loss, (out, updates)

            grad_fn = jax.value_and_grad(loss_of, has_aux=True)
            (loss, (out, updates)), grads = grad_fn(variables["params"])
            upd, new_opt_state = optimizer.update(
                grads, opt_state, variables["params"]
            )
            new_params = optax.apply_updates(variables["params"], upd)
            new_variables = dict(variables, params=new_params)
            if updates:
                new_variables["batch_stats"] = updates["batch_stats"]
            metrics = {
                name: fn(out, target, weight)
                for name, fn in metric_fns.items()
            }
            return new_variables, new_opt_state, loss, metrics

        def eval_step(variables, batch):
            x = self._prepare_input(
                jnp.asarray(batch["data"]), False, jax.random.PRNGKey(0)
            )
            x = self._encode(x)
            target = batch["target"]
            weight = batch["weight"]
            out, _ = forward(variables, x, False, jax.random.PRNGKey(0))
            loss = loss_fn(out, target, weight)
            metrics = {
                name: fn(out, target, weight)
                for name, fn in metric_fns.items()
            }
            pred = jnp.argmax(out, axis=1)
            prob = jnp.exp(
                jnp.take_along_axis(out, pred[:, None], axis=1)[:, 0]
            )
            return loss, metrics, pred, prob

        donate = (0, 1)
        self._jit_train_step = jax.jit(train_step, donate_argnums=donate)
        self._jit_eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def resume_checkpoint(self, checkpoint_path):
        cp = load_checkpoint(checkpoint_path)
        self.logger.info("Loading checkpoint: {} ...".format(checkpoint_path))
        self.start_epoch = cp["epoch"] + 1
        self.mnt_best = cp["monitor_best"]
        self.variables = restore_variables(self.variables, cp["state_dict"])
        self.opt_state = restore_variables(self.opt_state, cp["optimizer"])
        self.logger.info(
            "Checkpoint loaded. Resume training from epoch {}".format(
                self.start_epoch
            )
        )

    def save_checkpoint_file(self, epoch, save_best):
        filename = str(self.save_dir / f"checkpoint-epoch{epoch}.ckpt")
        save_checkpoint(
            filename,
            arch=type(self.model).__name__,
            epoch=epoch,
            variables=self.variables,
            opt_state=self.opt_state,
            monitor_best=self.mnt_best,
            config=self.config,
        )
        self.logger.info("Saving checkpoint: {} ...".format(filename))
        if save_best:
            best_path = str(self.save_dir / "model_best.ckpt")
            save_checkpoint(
                best_path,
                arch=type(self.model).__name__,
                epoch=epoch,
                variables=self.variables,
                opt_state=self.opt_state,
                monitor_best=self.mnt_best,
                config=self.config,
            )
            self.logger.info("Saving current best: model_best.ckpt ...")

    def reset_metrics_tracker(self):
        self.train_loss.reset()
        self.train_metrics.reset()
        self.val_loss.reset()
        self.val_metrics.reset()
        self.test_loss.reset()
        self.test_metrics.reset()

    # ------------------------------------------------------------------
    # main loops
    # ------------------------------------------------------------------

    def train(self, track4plot=False):
        not_improve_count = 0
        if track4plot:
            self.track4plot = str(self.log_dir / "log_loss.txt")
            append_log_to_file(
                self.track4plot, ["Epoch", "Train_loss", "Validation_loss"]
            )

        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)
            if track4plot:
                lines = [
                    epoch,
                    result.get(self.loss_name),
                    result.get("val_" + self.loss_name),
                ]
                append_log_to_file(self.track4plot, [str(x) for x in lines])

            log = {"epoch": epoch}
            log.update(result)
            for key, value in log.items():
                self.logger.info("    {:15s}: {}".format(str(key), value))

            best = False
            tracked_metric = log.get(self.tracked_metric)
            if tracked_metric is not None:
                improved = (
                    self.mode_monitor == "min"
                    and tracked_metric < self.mnt_best
                ) or (
                    self.mode_monitor == "max"
                    and tracked_metric > self.mnt_best
                )
                if improved:
                    self.mnt_best = tracked_metric
                    not_improve_count = 0
                    best = True
                else:
                    not_improve_count += 1

            if not_improve_count > self.early_stop:
                self.logger.info(
                    "Validation performance didn't improve for {} epochs. "
                    "Training stops.".format(self.early_stop)
                )
                break

            if epoch % self.save_step == 0:
                self.save_checkpoint_file(epoch, save_best=best)

            if isinstance(self.lr_scheduler, MultiStepLR):
                new_lr = self.lr_scheduler.step(
                    epoch, get_current_lr(self.opt_state)
                )
                self.opt_state = set_current_lr(self.opt_state, new_lr)

    def eval(self, save_result=False):
        if save_result:
            log, result = self._validate_epoch(1, save_result=True)
            res_path = str(self.save_dir / "result.csv")
            ids, targets, predictions, probs = [], [], [], []
            for batch_pred in result:
                ids += list(batch_pred[0])
                targets += list(batch_pred[1])
                predictions += list(batch_pred[2])
                probs += list(batch_pred[3])
            save_pandas_df(
                list(zip(ids, targets, predictions, probs)),
                res_path,
                columns=["Path", "Target", "Prediction", "Probability"],
                use_index=False,
            )
            print("Saved prediction to {}.".format(res_path))
        else:
            log = self._validate_epoch(1)
        for key, value in log.items():
            self.logger.info("    {:15s}: {}".format(str(key), value))
        return log

    def _train_epoch(self, epoch):
        raise NotImplementedError

    def _validate_epoch(self, epoch, save_result=False):
        raise NotImplementedError


class ClassificationTrainer(BaseTrainer):
    """Jitted forward/NLL/update loop (reference
    classification_trainer.py:9-80)."""

    def _train_epoch(self, epoch):
        self.reset_metrics_tracker()
        n_batches = len(self.train_loader)
        for batch_idx, batch in enumerate(self.train_loader):
            self._ensure_ready(batch)
            n = float(np.sum(batch["weight"]))
            arrays = self._place_batch({
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            })
            self.variables, self.opt_state, loss, metrics = \
                self._jit_train_step(
                    self.variables, self.opt_state, arrays, self._next_rng()
                )
            self.train_loss.update(self.loss_name, float(loss), n=1)
            for name, value in metrics.items():
                self.train_metrics.update(name, float(value), n=int(n))
            if batch_idx % self.log_step == 0:
                self.log_for_step(epoch, batch_idx, n_batches)

        log = self.train_loss.result()
        log.update(self.train_metrics.result())

        if self.do_val and (epoch % self.val_step == 0):
            log.update(self._validate_epoch(epoch))

        if isinstance(self.lr_scheduler, ReduceLROnPlateau):
            new_lr = self.lr_scheduler.step(
                self.val_loss.avg(self.loss_name),
                get_current_lr(self.opt_state),
            )
            self.opt_state = set_current_lr(self.opt_state, new_lr)
        return log

    def _validate_epoch(self, epoch, save_result=False):
        self.val_loss.reset()
        self.val_metrics.reset()
        self.logger.info("Validation: ")
        result = [] if save_result else None
        for batch_idx, batch in enumerate(self.val_loader):
            self._ensure_ready(batch)
            arrays = self._place_batch({
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            })
            loss, metrics, pred, prob = self._jit_eval_step(
                self.variables, arrays
            )
            n = float(np.sum(batch["weight"]))
            self.val_loss.update(self.loss_name, float(loss), n=1)
            for name, value in metrics.items():
                self.val_metrics.update(name, float(value), n=int(n))
            if batch_idx % self.log_step == 0:
                self.logger.debug(
                    "{}/{}".format(batch_idx, len(self.val_loader))
                )
                self.logger.debug(
                    "{}: {}".format(
                        self.loss_name, self.val_loss.avg(self.loss_name)
                    )
                )
            if save_result:
                keep = batch["weight"] > 0
                result.append(
                    [
                        [p for p, k in zip(batch["path"], keep) if k],
                        np.asarray(batch["target"])[keep],
                        np.asarray(pred)[keep],
                        np.asarray(prob)[keep],
                    ]
                )

        log = self.val_loss.result()
        log.update(self.val_metrics.result())
        val_log = {"val_{}".format(k): v for k, v in log.items()}
        if save_result:
            return val_log, result
        return val_log

    def log_for_step(self, epoch, batch_idx, n_batches):
        self.logger.info(
            "Train Epoch: {} [{}]/[{}] with {}, Loss: {:.6f}".format(
                epoch, batch_idx, n_batches, self.loss_name,
                self.train_loss.avg(self.loss_name),
            )
        )
        metric_values = [
            self.train_metrics.avg(x) for x in self.metric_names
        ]
        self.logger.info(
            ", ".join(
                "{}: {:.6f}".format(x, y)
                for x, y in zip(self.metric_names, metric_values)
            )
        )


class AugClassificationTrainer(ClassificationTrainer):
    """Online-augmentation trainer with a frozen encoder in the loop
    (reference online_aug_trainer.py:6-33): raw images are augmented ON
    DEVICE, pushed through the frozen encoder, then classified by the
    trainable MLP — all inside the same jitted step."""

    def __init__(self, config, model, loss=None, metrics=None,
                 optimizer=None, lr_scheduler=None, mesh=None, seed=123,
                 encoder=None, encoder_variables=None):
        super().__init__(config, model, loss, metrics, optimizer,
                         lr_scheduler, mesh=mesh, seed=seed)
        if encoder is None:
            from .. import models as model_md

            idx_enc = config["trainer"]["chosen_idx_enc"]
            encoder_info = config["trainer"]["encoders"][idx_enc]
            encoder, encoder_variables = model_md.build_model(
                encoder_info["name"], **encoder_info["args"]
            )
        # build_model returns variables only when the config asked for a
        # pretrained source; a non-pretrained encoder (e.g.
        # {"pretrained": null}) still needs initialised params — the
        # reference's torch modules self-initialise in __init__
        # (inception_resnet_v1.py), flax modules don't. Init is DEFERRED
        # to the first _encode call (the first batch through
        # _ensure_ready) so spatially-fixed encoders (iresnet's
        # flattened fc, iresnet.py) get params matching the real input
        # size rather than a config guess.
        self._encoder_init_rng = jax.random.PRNGKey(seed)
        self.encoder = encoder
        self.encoder_variables = encoder_variables

    def _encode(self, x):
        if self.encoder_variables is None:
            self.encoder_variables = self.encoder.init(
                self._encoder_init_rng,
                jnp.zeros((1,) + tuple(x.shape[1:]), jnp.float32),
            )
        emb = self.encoder.apply(self.encoder_variables, x, train=False)
        return jax.lax.stop_gradient(emb)
