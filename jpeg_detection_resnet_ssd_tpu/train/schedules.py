"""Learning-rate schedules replicating the reference's training recipes.

* Classification (`config/resnet/config_file.py:51-59,133-150`): SGD lr 0.1,
  momentum 0.9, nesterov, Keras `decay=1e-4` inverse-time decay; under data
  parallelism the lr is scaled linearly by replica count (÷ batch_size_divider
  4) with a 5-epoch linear warmup (Horovod `LearningRateWarmupCallback`).
* Detection (`training_dct_pascal_j2d_resnet.py:152`): constant SGD 1e-3,
  momentum 0.9.
"""

from __future__ import annotations

import optax


def keras_inverse_time_decay(base_lr: float, decay: float):
    """Keras-1-style per-step decay: lr_t = lr / (1 + decay * step)."""

    def schedule(step):
        return base_lr / (1.0 + decay * step)

    return schedule


def warmup_linear_scaling(
    base_lr: float,
    n_replicas: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    batch_size_divider: float = 4.0,
    after: optax.Schedule | None = None,
):
    """Goyal-et-al linear scaling + warmup, the reference's Horovod recipe.

    Ramps linearly from `base_lr` to `base_lr * n_replicas / divider` over
    `warmup_epochs`, then follows `after` (evaluated from step 0 of the
    post-warmup phase) or stays at the scaled lr.
    """
    target = base_lr * n_replicas / batch_size_divider
    warmup_steps = warmup_epochs * steps_per_epoch
    warm = optax.linear_schedule(base_lr, target, warmup_steps)
    tail = after if after is not None else optax.constant_schedule(target)
    return optax.join_schedules([warm, tail], [warmup_steps])
