"""Multi-host training input-path validation (SURVEY §2.8 parity).

Two real jax.distributed processes (CPU backend, 2 virtual devices
each) build a 4-device global mesh, stride a fixed global batch the way
DetLoader does (process_index::process_count), assemble it with
parallel.mesh.shard_batch (jax.make_array_from_process_local_data), and
run one train step. The updated-params fingerprint must match a
single-process 4-device run on the same global batch — proving the
DistributedSampler-equivalent input path + gradient all-reduce
end-to-end across process boundaries.

Reference counterpart: DistributedSampler + DDP all-reduce
(/root/reference/tools/train.py:118-125).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from r3det_tpu.models.detectors import (DetectorConfig, StageTrainCfg,
                                        build_detector)
from r3det_tpu.parallel.mesh import (init_train_state, make_mesh,
                                     make_train_step, replicate,
                                     shard_batch)

cfg = DetectorConfig(
    num_classes=3, stacked_convs=1, feat_channels=32, backbone_depth=10,
    num_refine_stages=1, stage_loss_weights=(1.0,),
    s0_train=StageTrainCfg(0.5, 0.4, 0.0, 'v1'),
    sr_train=(StageTrainCfg(0.6, 0.5, 0.0, None),))
B, size = 4, 64
r = np.random.RandomState(0)
images = r.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
gt = np.stack([np.stack([
    r.uniform(10, size - 10, 4), r.uniform(10, size - 10, 4),
    r.uniform(8, 24, 4), r.uniform(6, 16, 4),
    r.uniform(-1.4, -0.1, 4)], -1) for _ in range(B)]).astype(np.float32)
labels = np.zeros((B, 4), np.int32)
mask = np.ones((B, 4), bool)
gbatch = {'image': images, 'gt_bboxes': gt, 'gt_labels': labels,
          'gt_mask': mask}
featmaps = tuple((max(size // s, 1), max(size // s, 1))
                 for s in cfg.strides)

model = build_detector(cfg, dtype=jnp.float32)
state0 = init_train_state(model, jax.random.PRNGKey(0),
                          jnp.asarray(images[:1]))
mesh = make_mesh(jax.devices())            # global mesh (4 devices)
state = replicate(state0, mesh)
# DetLoader process stride of the SAME seeded global order
local = {k: v[pid::nproc] for k, v in gbatch.items()} if nproc > 1 \
    else gbatch
batch = shard_batch(local, mesh)
step = make_train_step(model, cfg, featmaps, mesh, donate=False)
new_state, losses = step(state, batch)
psum = float(sum(
    np.abs(np.asarray(jax.device_get(l))).sum(dtype=np.float64)
    for l in jax.tree_util.tree_leaves(new_state.params)))
loss = float(np.asarray(jax.device_get(losses['total'])))
with open(out_path, 'w') as f:
    f.write(f'{psum!r} {loss!r}\n')
print(f'proc{pid} psum={psum!r} loss={loss!r}', flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc, port, tmpdir, tag):
    env = dict(os.environ)
    env['XLA_FLAGS'] = ('--xla_force_host_platform_device_count='
                        f'{4 // nproc}')
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    script = os.path.join(tmpdir, 'worker.py')
    with open(script, 'w') as f:
        f.write(WORKER)
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(tmpdir, f'{tag}_{pid}.txt')
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, script, str(pid), str(nproc), str(port), out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log}'
    vals = []
    for out in outs:
        with open(out) as f:
            psum, loss = f.read().split()
            vals.append((float(psum), float(loss)))
    return vals


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    single = _run_workers(1, 0, str(tmp_path), 'single')[0]
    multi = _run_workers(2, _free_port(), str(tmp_path), 'multi')
    for psum, loss in multi:
        assert abs(loss - single[1]) <= 1e-5 * max(1.0, abs(single[1])), (
            f'2-process loss {loss!r} != single {single[1]!r}')
        assert abs(psum - single[0]) <= 1e-4 * max(1.0, abs(single[0])), (
            f'2-process updated params {psum!r} != single {single[0]!r}')
