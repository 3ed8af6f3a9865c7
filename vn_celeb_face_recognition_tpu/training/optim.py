"""Optimizers + host-side LR schedulers with torch-compatible semantics.

The reference trains with torch.optim.Adam(lr, weight_decay) and steps
ReduceLROnPlateau on the validation loss (train.py:63-68,
classification_trainer.py:37-38) or MultiStepLR (base_trainer.py:173-174).

torch's Adam applies weight decay as an L2 term ADDED TO THE GRADIENT
before the moment updates (not decoupled AdamW), so the optax chain here
is add_decayed_weights -> scale_by_adam -> scale(-lr), which reproduces
those numerics. The learning rate is injected as mutable state
(optax.inject_hyperparams) so host-side plateau scheduling works without
recompiling the jitted train step.
"""

import optax


def make_optimizer(name, args):
    """Build an optax optimizer from a reference-style config block."""
    args = dict(args)
    lr = args.pop("lr", 1e-3)
    if name == "Adam":
        weight_decay = args.pop("weight_decay", 0.0)
        betas = args.pop("betas", (0.9, 0.999))
        eps = args.pop("eps", 1e-8)

        @optax.inject_hyperparams
        def tx(learning_rate):
            chain = []
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(
                optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
            )
            chain.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*chain)

        return tx(learning_rate=lr)
    if name == "SGD":
        momentum = args.pop("momentum", 0.0)
        weight_decay = args.pop("weight_decay", 0.0)

        @optax.inject_hyperparams
        def tx(learning_rate):
            chain = []
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            if momentum:
                chain.append(optax.trace(decay=momentum))
            chain.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*chain)

        return tx(learning_rate=lr)
    raise ValueError(f"Unknown optimizer '{name}'")


def get_current_lr(opt_state):
    return float(opt_state.hyperparams["learning_rate"])


def set_current_lr(opt_state, lr):
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype
    )
    return opt_state


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics on the host."""

    def __init__(self, mode="min", factor=0.1, patience=10, threshold=1e-4,
                 threshold_mode="rel", cooldown=0, min_lr=0.0, verbose=False):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.verbose = verbose
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, metric):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1.0 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1.0 + self.threshold)
        return metric > self.best + self.threshold

    def step(self, metric, current_lr):
        """Returns the (possibly reduced) learning rate."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(current_lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
            if self.verbose and new_lr < current_lr:
                print(f"ReduceLROnPlateau: lr {current_lr:g} -> {new_lr:g}")
            return new_lr
        return current_lr


class MultiStepLR:
    """torch MultiStepLR: multiply lr by gamma at each milestone epoch."""

    def __init__(self, milestones, gamma=0.1, verbose=False):
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.verbose = verbose

    def lr_at(self, base_lr, epoch):
        k = sum(1 for m in self.milestones if epoch >= m)
        return base_lr * (self.gamma ** k)

    def step(self, epoch, current_lr, base_lr=None):
        base = base_lr if base_lr is not None else current_lr
        new_lr = self.lr_at(base, epoch)
        if self.verbose and new_lr != current_lr:
            print(f"MultiStepLR: lr {current_lr:g} -> {new_lr:g}")
        return new_lr


def make_lr_scheduler(name, args):
    args = dict(args)
    if name == "ReduceLROnPlateau":
        args.pop("verbose", None)
        return ReduceLROnPlateau(**args)
    if name == "MultiStepLR":
        args.pop("verbose", None)
        return MultiStepLR(**args)
    raise ValueError(f"Unknown lr scheduler '{name}'")
