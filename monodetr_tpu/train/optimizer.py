"""Optimizer with the reference's exact AdamW semantics + frozen-parameter
policy, as an optax-style gradient transformation.

The reference AdamW (lib/helpers/optimizer_helper.py:30-129) differs from
torch.optim.AdamW in one detail: the decoupled weight-decay term is scaled by
the bias-corrected step size, i.e.

    p -= lr * sqrt(1-b2^t)/(1-b1^t) * ( wd * p + m / (sqrt(v) + eps) )

with raw (un-bias-corrected) EMAs m, v (optimizer_helper.py:112-127).  Weight
decay is applied to every parameter except those torch-named `bias`
(optimizer_helper.py:8-16); in our tree that's every leaf not named `bias`
(torch norm `weight` == our `scale` and it *does* get decay in the reference).

Frozen parameters (reference backbone.py:71-73 sets requires_grad=False):
stem + layer1 of the backbone and every FrozenBN scale/bias receive zero
updates — enforced here with a path mask so the train step stays a single
pjit-able function.

sgd (momentum 0.9) and adam are also supported (optimizer_helper.py:18-21).
"""

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class RefAdamWState(NamedTuple):
    step: jnp.ndarray
    m: Any
    v: Any


def _is_frozen(path) -> bool:
    """Reference freezing policy: backbone stem+layer1 conv kernels and all
    FrozenBN affines never train."""
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if "backbone" not in keys:
        return False
    after = keys[keys.index("backbone") + 1]
    if after in ("conv1", "bn1"):  # stem
        return True
    if isinstance(after, str) and after.startswith("layer1_"):
        return True
    # FrozenBN affines in any block
    for k in keys:
        if isinstance(k, str) and (k in ("bn1", "bn2", "bn3", "downsample_bn")):
            return True
    return False


def _wants_decay(path) -> bool:
    leaf = getattr(path[-1], "key", getattr(path[-1], "name", str(path[-1])))
    return leaf != "bias"


def freeze_mask(params) -> Any:
    """True where the parameter trains."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: not _is_frozen(p), params
    )


def decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _wants_decay(p), params
    )


def ref_adamw(weight_decay: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8):
    """Gradient transformation implementing the reference AdamW.

    The learning rate is injected per-call via optax.inject_hyperparams-style
    state; here we simply read it from `params`-side: use
    `update(grads, state, params, lr=...)`.
    """

    def init(params):
        # m and v must be DISTINCT buffer trees: sharing one zeros tree makes
        # donated train steps fail with "attempt to donate the same buffer
        # twice" (and was the source of nondeterministic TPU runtime errors)
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RefAdamWState(step=jnp.zeros((), jnp.int32), m=m, v=v)

    def update(grads, state, params, lr, train_mask, wd_mask):
        step = state.step + 1
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads
        )
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads
        )
        t = step.astype(jnp.float32)
        step_size = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)

        def upd(m_, v_, p, trains, decays):
            wd = weight_decay if decays else 0.0
            delta = -step_size * (wd * p + m_ / (jnp.sqrt(v_) + eps))
            return jnp.where(trains, delta, 0.0)

        updates = jax.tree_util.tree_map(
            upd, m, v, params, train_mask, wd_mask
        )
        return updates, RefAdamWState(step=step, m=m, v=v)

    return init, update


def build_optimizer(cfg_optimizer: Dict[str, Any], params):
    """Returns (opt_state, update_fn(grads, state, params, lr) ->
    (new_params, new_state)).  Matches optimizer_helper.build_optimizer."""
    kind = cfg_optimizer.get("type", "adamw")
    wd = float(cfg_optimizer.get("weight_decay", 0.0001))
    train_mask = freeze_mask(params)
    wd_mask = decay_mask(params)

    if kind == "adamw":
        init, update = ref_adamw(wd)
        state = init(params)

        def step_fn(grads, state, params, lr):
            updates, state = update(grads, state, params, lr, train_mask, wd_mask)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, state

        return state, step_fn

    if kind == "sgd":

        def sgd_init(params):
            return jax.tree_util.tree_map(jnp.zeros_like, params)

        def sgd_step(grads, state, params, lr):
            mom = jax.tree_util.tree_map(
                lambda m_, g, p, decays: 0.9 * m_ + g + (wd if decays else 0.0) * p,
                state, grads, params, wd_mask,
            )
            mom = jax.tree_util.tree_map(
                lambda m_, trains: jnp.where(trains, m_, 0.0), mom, train_mask
            )
            new_p = jax.tree_util.tree_map(
                lambda p, m_, trains: jnp.where(trains, p - lr * m_, p),
                params, mom, train_mask,
            )
            return new_p, mom

        return sgd_init(params), sgd_step

    if kind == "adam":
        init, update = ref_adamw(0.0)  # adam == adamw with wd 0 in this form
        state = init(params)

        def adam_fn(grads, state, params, lr):
            updates, state = update(grads, state, params, lr, train_mask, wd_mask)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, state

        return state, adam_fn

    raise NotImplementedError(f"{kind} optimizer is not supported")
