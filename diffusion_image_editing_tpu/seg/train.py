"""BiSeNet training: data-parallel over a JAX mesh, OHEM 3-head loss,
warmup+poly SGD, Orbax checkpoints with resume.

Rebuild of `src/Segmentation/train.py`: the reference's
NCCL/DistributedDataParallel setup (`train.py:47-52,77-80`) becomes a
`jax.sharding.Mesh` with the batch sharded over a 'dp' axis — XLA inserts the
gradient all-reduce; BatchNorm moments are per-device by default (the DDP
behaviour) or globally synced when the model is built with norm="abn_sync"
(the InPlaceABNSync capability). Unlike the reference (which only saves,
`train.py:162-175`), checkpoints here restore optimizer state + step for true
resume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.bisenet import BiSeNet
from .losses import ohem_ce_loss
from .optim import make_optimizer

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of `Segmentation/train.py:56-103` as a config object
    (the reference hardcodes them)."""

    n_classes: int = 19
    image_size: int = 448
    batch_size_per_device: int = 16
    max_iter: int = 80000
    lr0: float = 1e-2
    momentum: float = 0.9
    weight_decay: float = 5e-4
    warmup_steps: int = 1000
    warmup_start_lr: float = 1e-5
    power: float = 0.9
    ohem_thresh: float = 0.7
    score_thres: float = 0.7
    norm: str = "bn"  # "bn" | "abn" | "abn_sync"
    width: int = 64
    ckpt_every: int = 5000
    # conv/matmul COMPUTE dtype ("float32" | "bfloat16"): params, norm
    # statistics and the loss stay f32 either way (mixed precision). The
    # reference trains pure f32; bf16 is the TPU-native fast path.
    compute_dtype: str = "float32"

    @property
    def n_min(self) -> int:
        return self.batch_size_per_device * self.image_size**2 // 16


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def create_model(cfg: TrainConfig, axis_name: Optional[str] = None) -> BiSeNet:
    dt = jnp.bfloat16 if cfg.compute_dtype in ("bf16", "bfloat16") else jnp.float32
    return BiSeNet(n_classes=cfg.n_classes, norm=cfg.norm,
                   axis_name=axis_name, width=cfg.width, dtype=dt)


def create_train_state(cfg: TrainConfig, key: Array, axis_name: Optional[str] = None):
    model = create_model(cfg, axis_name)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    variables = model.init(key, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(
        params, lr0=cfg.lr0, momentum=cfg.momentum, weight_decay=cfg.weight_decay,
        warmup_steps=cfg.warmup_steps, warmup_start_lr=cfg.warmup_start_lr,
        max_iter=cfg.max_iter, power=cfg.power,
    )
    state = TrainState(
        step=jnp.int32(0), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), tx=tx,
    )
    return model, state


def _prep_batch(images: Array, labels: Array) -> Tuple[Array, Array]:
    """Device-side feed decode: a uint8 batch (raw pixels + uint8 labels) is
    ImageNet-normalized HERE instead of on the host, so the host->HBM
    transfer carries 4x fewer bytes (38.5 -> 9.6 MB images + 12.8 -> 3.2 MB
    labels per 448px batch-16 — the transfer IS the host-fed bottleneck on
    this machine's relay). float input passes through untouched (host
    normalization, `data.to_model_input`) — identical arithmetic either way
    (uint8/255 - mean)/std in f32."""
    from .data import IMAGENET_MEAN, IMAGENET_STD

    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    else:
        x = images
    return x, labels.astype(jnp.int32)


def make_train_step(model: BiSeNet, cfg: TrainConfig):
    """One SGD step: 3-head OHEM sum (`train.py:127-131`)."""

    def loss_fn(params, batch_stats, images, labels):
        images, labels = _prep_batch(images, labels)
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        out, out16, out32 = outs
        n_min = cfg.n_min
        loss = (
            ohem_ce_loss(out, labels, cfg.score_thres, n_min)
            + ohem_ce_loss(out16, labels, cfg.score_thres, n_min)
            + ohem_ce_loss(out32, labels, cfg.score_thres, n_min)
        )
        return loss, mutated["batch_stats"]

    def train_step(state: TrainState, images: Array, labels: Array):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, labels
        )
        return state.apply_gradients(grads, new_bs), loss

    return train_step


def make_sharded_train_step(model: BiSeNet, cfg: TrainConfig, mesh: Mesh):
    """DDP-equivalent step over the 'dp' mesh axis (`train.py:77-80`):
    `shard_map` keeps the per-device batch local (so BatchNorm moments are
    per-device unless the model syncs them via axis_name="dp" — the
    InPlaceABNSync capability), and the gradient all-reduce the reference
    gets from NCCL is an explicit `lax.pmean`. Params/optimizer state are
    replicated; batch and labels sharded on 'dp'."""

    def loss_fn(params, batch_stats, images, labels):
        images, labels = _prep_batch(images, labels)
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        out, out16, out32 = outs
        n_min = cfg.n_min
        loss = (
            ohem_ce_loss(out, labels, cfg.score_thres, n_min)
            + ohem_ce_loss(out16, labels, cfg.score_thres, n_min)
            + ohem_ce_loss(out32, labels, cfg.score_thres, n_min)
        )
        return loss, mutated["batch_stats"]

    def local_step(state: TrainState, images: Array, labels: Array):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, labels
        )
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        # running stats: average across devices so the replicated state stays
        # consistent (the reference's DDP keeps rank-local stats and saves
        # rank 0's — averaging is strictly better-determined)
        new_bs = jax.lax.pmean(new_bs, "dp")
        return state.apply_gradients(grads, new_bs), loss

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch(batch: Tuple[np.ndarray, np.ndarray], mesh: Mesh):
    data = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(np.asarray(x), data) for x in batch)


# ---------------------------------------------------------------------------
# Checkpointing (Orbax) — save AND resume (fixes the reference's save-only
# flow, train.py:162-175)
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(
            int(state.step),
            args=ocp.args.PyTreeSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state, "step": state.step}
            ),
        )


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state
        restored = mgr.restore(step, args=ocp.args.PyTreeRestore(template))
    return state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"], opt_state=restored["opt_state"],
    )


def train_loop(
    cfg: TrainConfig,
    data_iter,
    mesh: Optional[Mesh] = None,
    ckpt_dir: Optional[str] = None,
    num_steps: Optional[int] = None,
    seed: int = 0,
    log_every: int = 50,
    logger=None,
):
    """The 80k-iteration loop of `train.py:111-160`, resumable."""
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("dp",))
    axis_name = "dp" if cfg.norm == "abn_sync" else None
    model, state = create_train_state(cfg, jax.random.PRNGKey(seed), axis_name)
    if ckpt_dir is not None:
        state = restore_checkpoint(ckpt_dir, state)
    step_fn = make_sharded_train_step(model, cfg, mesh)

    target = num_steps if num_steps is not None else cfg.max_iter
    losses = []
    while int(state.step) < target:
        images, labels = shard_batch(next(data_iter), mesh)
        state, loss = step_fn(state, images, labels)
        losses.append(float(loss))
        it = int(state.step)
        if logger and it % log_every == 0:
            logger.info("it %d loss %.4f", it, float(loss))
        if ckpt_dir is not None and it % cfg.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state)
    if ckpt_dir is not None:
        save_checkpoint(ckpt_dir, state)
    return model, state, losses
