"""Data-parallel training over a TPU device mesh.

Replaces the reference's distributed stack — torch DDP + NCCL all-reduce +
torch.distributed.launch (SURVEY.md §2.8) — with the JAX SPMD recipe:
one 1-D ``Mesh(('data',))``, parameters replicated, batches sharded on the
leading axis, gradients reduced by the XLA-inserted collectives (psum over
ICI within a slice, DCN across slices). Multi-host startup is
``jax.distributed.initialize()`` + per-host input sharding; there is no
backend selection and no launcher script semantics to replicate.

Optimization matches configs/_base_/schedules/schedule_1x.py: SGD momentum
0.9, weight decay 1e-4, global grad-norm clip 35, linear warmup (500
iters, ratio 1/3) then step decay 0.1x at the configured epochs.
"""
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.detectors import detector_loss, detector_predict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Multi-process meshes assemble the (identical, e.g. same-seed-init or
    restored-checkpoint) host value into a global replicated jax.Array;
    hosts must hold the same value, as with DDP broadcast_buffers.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1 or all(
            d.process_index == jax.process_index()
            for d in mesh.devices.flat):
        return jax.device_put(tree, sharding)

    def _repl(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, x.shape)

    return jax.tree_util.tree_map(_repl, tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Shard every leaf on its leading (batch) axis.

    Single-process: a plain device_put of the host batch. Multi-process
    (the mesh spans non-addressable devices): each host holds only its
    OWN slice of the global batch (DetLoader's process stride), and the
    leaves assemble into one global jax.Array via
    jax.make_array_from_process_local_data — the input-side counterpart
    of the reference's DistributedSampler + DDP pairing (SURVEY §2.8).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    nproc = jax.process_count()
    if nproc == 1 or all(d.process_index == jax.process_index()
                         for d in mesh.devices.flat):
        return jax.device_put(batch, sharding)

    def _assemble(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(_assemble, batch)


def make_lr_schedule(base_lr: float = 2.5e-3, warmup_iters: int = 500,
                     warmup_ratio: float = 1.0 / 3.0,
                     step_epochs: Sequence[int] = (8, 11),
                     iters_per_epoch: int = 1000, gamma: float = 0.1):
    """mmcv StepLrUpdater + linear warmup (schedule_1x.py:6-12)."""
    boundaries = {int(e * iters_per_epoch): gamma for e in step_epochs}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(step):
        warm = base_lr * (warmup_ratio +
                          (1 - warmup_ratio) * step / max(warmup_iters, 1))
        return jnp.where(step < warmup_iters, warm, decay(step))
    return schedule


def make_optimizer(lr_schedule, momentum=0.9, weight_decay=1e-4,
                   clip_norm=35.0):
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=lr_schedule, momentum=momentum))


def init_train_state(model, rng, sample_images, tx=None,
                     lr_schedule=None) -> TrainState:
    # jit: eager flax init dispatches every initializer separately
    # (~10x slower than one compiled program)
    variables = jax.jit(model.init)(rng, sample_images)
    if tx is None:
        tx = make_optimizer(lr_schedule or make_lr_schedule())
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get('batch_stats', {}),
                      opt_state=tx.init(params), tx=tx)


def make_train_step(model, cfg, featmap_sizes, mesh: Mesh,
                    donate: bool = True) -> Callable:
    """Jitted SPMD train step: params replicated, batch sharded on 'data'.

    XLA inserts the gradient all-reduce because the (replicated) output
    params depend on the (sharded) batch — the TPU-native equivalent of
    DDP's NCCL all-reduce.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    batch_shardings = {'image': data, 'gt_bboxes': data, 'gt_labels': data,
                       'gt_mask': data}

    # fresh per-step key for the RRandomSampler route (when a stage
    # configures one); derived from the global step so resume and
    # multi-host replicas sample identically
    any_sampler = (cfg.s0_train.sampler is not None or
                   any(s.sampler is not None for s in cfg.sr_train))

    def step(state: TrainState, batch):
        rng = (jax.random.fold_in(jax.random.PRNGKey(0), state.step)
               if any_sampler else None)

        def loss_fn(params):
            out = model.apply({'params': params,
                               'batch_stats': state.batch_stats},
                              batch['image'])
            losses = detector_loss(out, cfg, featmap_sizes,
                                   batch['gt_bboxes'], batch['gt_labels'],
                                   batch['gt_mask'], rng=rng)
            return losses['total'], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), losses

    return jax.jit(step,
                   in_shardings=(repl, batch_shardings),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_predict_step(model, cfg, featmap_sizes, mesh: Optional[Mesh] = None,
                      img_shape=None) -> Callable:
    """Jitted inference step: batch in, padded dets out."""
    def step(variables, images):
        out = model.apply(variables, images)
        return detector_predict(out, cfg, featmap_sizes,
                                img_shape=img_shape)

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(data, data, data))
