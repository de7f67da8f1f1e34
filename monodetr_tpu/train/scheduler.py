"""Learning-rate schedule: per-epoch multiplicative step decay + optional
5-epoch cosine warmup.

Parity with lib/helpers/scheduler_helper.py:6-18 + trainer_helper.py:80-83:
the warmup scheduler (init_lr 1e-5, cosine over 5 epochs) is stepped for
epochs < 5, the step-decay LambdaLR otherwise.  LR is a pure function of the
epoch here — the trainer passes it into the jitted step as a scalar.

The reference's LinearWarmupLR and BNMomentumScheduler
(scheduler_helper.py:21-33,80-89) are defined-but-never-built there (no
bnm_scheduler config section; build_bnm_scheduler is never called) and are
deliberately NOT re-implemented: BN here is frozen and folded into conv
scale/bias, and warmup is the cosine form the reference actually runs.
"""

import math
from typing import Any, Dict


def lr_at_epoch(cfg_lr: Dict[str, Any], base_lr: float, epoch: int,
                max_epoch: int = 195) -> float:
    """LR used *during* epoch `epoch` (0-based).

    Reference semantics: schedulers are stepped after each epoch, so epoch 0
    runs at base_lr (or warmup(0) = init_lr); epoch e runs at the value after
    e steps.

    `type: 'cos'` is declared config surface in the reference
    (configs/monodetr.yaml:99 "'step' or 'cos'") but its build_lr_scheduler
    (scheduler_helper.py:6-18) ignores cfg['type'] and always builds the
    step LambdaLR; here 'cos' is honored as standard cosine annealing
    base_lr -> 0 over max_epoch (post-warmup).
    """
    warmup = cfg_lr.get("warmup", False)
    if warmup and epoch < 5:
        init_lr = 0.00001
        return init_lr + (base_lr - init_lr) * (1 - math.cos(math.pi * epoch / 5)) / 2

    if cfg_lr.get("type", "step") == "cos":
        return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max_epoch))

    decay = 1.0
    for step in cfg_lr.get("decay_list", []):
        if epoch >= step:
            decay *= cfg_lr.get("decay_rate", 0.1)
    return base_lr * decay
