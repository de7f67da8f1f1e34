"""SPMD data parallelism over a device mesh.

The reference's only multi-device path is single-process nn.DataParallel
(tools/train_val.py:54-55) plus vestigial NCCL helpers (utils/misc.py:
reduce_dict, init_distributed_mode — never wired up).  The TPU-native
equivalent is compiled SPMD: params replicated, the batch sharded over a
1-D `data` mesh axis, and ONE jitted train step whose gradient all-reduce
XLA emits as an ICI collective — no user-level communication code, no
gradient-averaging python.  Semantics are bit-identical to single-device
large-batch training (the reference's DataParallel differs: per-GPU
BatchNorm stats — moot here, our backbone norm is frozen).

Multi-host: per-host loaders feed host-local shards via
`jax.make_array_from_process_local_data`; `jax.process_index() == 0` gates
logging/checkpointing (replacing is_main_process, utils/misc.py:381-402).
"""

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch_fn(mesh: Mesh, axis_name: str = "data") -> Callable:
    """Returns a function placing a host batch dict onto the mesh, sharded
    along the batch dimension.

    Single-process: device_put with a batch-sharded NamedSharding.
    Multi-host (jax.process_count() > 1): each process's loader yields only
    its host-local slice of the global batch (see DataLoader
    process_shard); `jax.make_array_from_process_local_data` assembles the
    global jax.Array from the per-host shards without any cross-host copy.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    if jax.process_count() > 1:
        def place(batch: Dict[str, Any]) -> Dict[str, Any]:
            return {
                k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v))
                for k, v in batch.items()
            }
    else:
        def place(batch: Dict[str, Any]) -> Dict[str, Any]:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    return place


def make_parallel_train_step(model, criterion, step_fn, mesh: Mesh,
                             axis_name: str = "data",
                             donate: bool = True) -> Callable:
    """Data-parallel jitted train step.

    Identical math to train_step.make_train_step: the global loss (with its
    global num_boxes normalization, reference monodetr.py:504-508) is
    computed by XLA SPMD across the mesh; gradients come out replicated.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["images"], batch["calibs"], batch["img_sizes"],
            train=True, deterministic=False, rngs={"dropout": rng},
        )
        losses = criterion(out, batch, train=True)
        return criterion.total(losses), losses

    loss_keys = []

    def step(params, opt_state, batch, lr, rng):
        import jax.numpy as jnp

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        params, opt_state = step_fn(grads, opt_state, params, lr)
        keys = sorted(losses.keys())
        if not loss_keys:
            loss_keys.extend(keys + ["loss_detr"])
        return params, opt_state, jnp.stack([losses[k] for k in keys] + [total])

    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, data, None, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )

    def wrapped(params, opt_state, batch, lr, rng):
        from ..train.train_step import LossVector

        params, opt_state, stacked = jitted(params, opt_state, batch, lr, rng)
        return params, opt_state, LossVector(tuple(loss_keys), stacked)

    return wrapped


def make_parallel_eval_step(model, mesh: Mesh, topk: int = 50,
                            axis_name: str = "data") -> Callable:
    from ..eval.decode import extract_dets_from_outputs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def step(params, images, calibs, img_sizes):
        out = model.apply(params, images, calibs, img_sizes, train=False)
        return extract_dets_from_outputs(out, topk=topk)

    return jax.jit(
        step,
        in_shardings=(repl, data, data, data),
        out_shardings=data,
    )


def maybe_init_distributed() -> int:
    """Initialize jax.distributed from the environment when running
    multi-host (JAX_COORDINATOR_ADDRESS / TPU pod env); returns
    process_index.  Replaces the reference's NCCL init_distributed_mode
    (utils/misc.py:410-432, which its entry point never called)."""
    import os

    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized or single-process
    return jax.process_index()
