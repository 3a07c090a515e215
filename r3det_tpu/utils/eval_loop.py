"""Dataset inference loop: single-device, multi-device (mesh-sharded),
and multi-host (per-process dataset shard + process-0 gather).

Re-provides the reference's single_gpu_test / multi_gpu_test + result
collection (/root/reference/tools/test.py:204-213) the TPU-native way:
one jitted predict step whose batch is sharded over the local mesh
('data' axis), padded fixed-shape outputs fetched to host, and — when
running multi-process — a process_allgather of each batch's padded
results instead of rank-0 CPU collection.
"""
import numpy as np

import jax
import jax.numpy as jnp

from ..core.rtransforms_np import rbbox2result
from ..datasets.transforms import Normalize, Pad, RResize
from ..parallel.mesh import make_predict_step


def evaluate_dataset(variables, model, det_cfg, ds, img_size=1024,
                     batch_size=4, mesh=None, pipeline=None, progress=None):
    """Run inference over every image of ``ds``.

    Returns a list (len(ds)) of per-class numpy det lists (the
    rbbox2result format the DOTA evaluator and submission writer eat).

    mesh: optional jax.sharding.Mesh — batches are sharded on the 'data'
    axis across its devices (batch_size must divide evenly). Multi-host:
    each process runs the images of its own slice and results are
    all-gathered, so every process returns the full list.

    img_size: int (square) or (h, w); the anchor grid and the fixed pad
    canvas derive from its divisor-rounded form.
    """
    hw = (img_size, img_size) if isinstance(img_size, int) \
        else tuple(img_size)
    canvas = tuple(-(-d // 32) * 32 for d in hw)
    if pipeline is None:
        pipeline = [RResize((hw[1], hw[0])), Normalize(),
                    Pad(32, fixed_size=canvas)]
    else:
        for stage in pipeline:
            if isinstance(stage, Pad):
                stage.fixed_size = canvas
    featmap_sizes = tuple((canvas[0] // s, canvas[1] // s)
                          for s in det_cfg.strides)
    predict = make_predict_step(model, det_cfg, featmap_sizes, mesh=mesh,
                                img_shape=canvas)
    if mesh is not None:
        n_dev = len(mesh.devices.reshape(-1))
        assert batch_size % n_dev == 0, (
            f'batch_size {batch_size} must divide over {n_dev} devices')
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        variables = jax.device_put(variables, repl)

    n_proc = jax.process_count()
    proc = jax.process_index()

    results = [None] * len(ds)
    # multi-host: stride the dataset across processes
    my_indices = list(range(proc, len(ds), n_proc)) if n_proc > 1 else \
        list(range(len(ds)))

    for start in range(0, len(my_indices), batch_size):
        idxs = my_indices[start:start + batch_size]
        batch_samples = []
        for i in idxs:
            r = ds.get_sample(i)
            for stage in pipeline:
                r = stage(r)
            batch_samples.append(r)
        imgs = np.stack([s['img'] for s in batch_samples])
        if len(imgs) < batch_size:           # pad the tail batch
            pad = np.repeat(imgs[-1:], batch_size - len(imgs), axis=0)
            imgs = np.concatenate([imgs, pad])
        x = jnp.asarray(imgs)
        if mesh is not None:
            x = jax.device_put(x, data)
        dets, labels, num = jax.device_get(predict(variables, x))
        for bi, (i, s) in enumerate(zip(idxs, batch_samples)):
            n = int(num[bi])
            d = dets[bi, :n].astype(np.float32)
            d[:, :4] /= s['scale_factor']     # angle not rescaled
            results[i] = rbbox2result(d, labels[bi, :n],
                                      det_cfg.num_classes)
        if progress is not None:
            progress(min(start + batch_size, len(my_indices)),
                     len(my_indices))

    if n_proc > 1:
        results = _allgather_results(results, det_cfg.num_classes)
    return results


def _allgather_results(results, num_classes):
    """Fill the None slots of a strided result list from the other
    processes (multihost_utils.process_allgather on padded arrays)."""
    from jax.experimental import multihost_utils
    filled = [i for i, r in enumerate(results) if r is not None]
    max_dets = max([sum(len(c) for c in results[i]) for i in filled],
                   default=0)
    max_dets = int(multihost_utils.process_allgather(
        jnp.asarray(max_dets)).max())
    n = len(results)
    # encode every local result as (n, max_dets, 7): [cls, 5 box, score]
    buf = np.zeros((n, max_dets, 7), np.float32)
    cnt = np.zeros((n,), np.int32)
    own = np.zeros((n,), bool)
    for i in filled:
        rows = []
        for cls_id, cls_dets in enumerate(results[i]):
            for det in cls_dets:
                rows.append(np.concatenate([[cls_id], det]))
        own[i] = True
        cnt[i] = len(rows)
        if rows:
            buf[i, :len(rows)] = np.stack(rows)
    g_buf = np.asarray(multihost_utils.process_allgather(jnp.asarray(buf)))
    g_cnt = np.asarray(multihost_utils.process_allgather(jnp.asarray(cnt)))
    g_own = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(own)))
    out = []
    for i in range(n):
        src = int(np.argmax(g_own[:, i]))
        rows = g_buf[src, i, :g_cnt[src, i]]
        per_cls = [rows[rows[:, 0] == c][:, 1:].astype(np.float32)
                   for c in range(num_classes)]
        out.append(per_cls)
    return out
