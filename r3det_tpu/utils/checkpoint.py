"""Checkpoint save/restore via orbax + torch->flax backbone conversion.

Re-provides the reference's checkpoint story (SURVEY.md §5): mmcv
CheckpointHook -> orbax; `torchvision://resnet50` pretrained init -> a
torch state_dict converter; publish_model (strip optimizer + hash) ->
`publish_checkpoint`.
"""
import hashlib
import os
import os.path as osp
import shutil
from typing import Any, Dict

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state) -> str:
    ocp = _ocp()
    path = osp.abspath(osp.join(ckpt_dir, f'step_{step}'))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {'step': np.asarray(state.step),
               'params': jax.device_get(state.params),
               'batch_stats': jax.device_get(state.batch_stats),
               'opt_state': jax.device_get(state.opt_state)}
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state):
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(osp.abspath(path))
    return state.replace(
        step=jax.numpy.asarray(payload['step']),
        params=payload['params'],
        batch_stats=payload['batch_stats'],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(payload['opt_state'])))


def publish_checkpoint(in_path: str, out_path: str) -> str:
    """Strip optimizer state, append content hash to the filename.

    Parity: tools/model_converters/publish_model.py:17-34.
    """
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(osp.abspath(in_path))
    slim = {'params': payload['params'],
            'batch_stats': payload.get('batch_stats', {})}
    tmp = osp.abspath(out_path.rstrip('/'))
    ckptr.save(tmp, slim, force=True)
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(slim):
        h.update(np.ascontiguousarray(leaf).tobytes())
    final = f'{tmp}-{h.hexdigest()[:8]}'
    if osp.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


# ---------------------------------------------------------------------
# torch (torchvision resnet50) -> flax ResNet parameter conversion
# ---------------------------------------------------------------------

def convert_torch_resnet(state_dict: Dict[str, Any], depth=50,
                         stem_space_to_depth=True):
    """torchvision ResNet state_dict -> (params, batch_stats) pytrees for
    models.resnet.ResNet. Conv kernels transpose OIHW -> HWIO.

    Works on any mapping of str -> array-like (so .pth loaded with
    torch.load(map_location='cpu') or a numpy dict both work).
    """
    def arr(k):
        v = state_dict[k]
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def conv(k):
        return {'kernel': arr(k + '.weight').transpose(2, 3, 1, 0)}

    def bn(k):
        return ({'scale': arr(k + '.weight'), 'bias': arr(k + '.bias')},
                {'mean': arr(k + '.running_mean'),
                 'var': arr(k + '.running_var')})

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if stem_space_to_depth:
        from ..models.resnet import fold_stem_kernel
        params['conv1'] = {'kernel': fold_stem_kernel(
            arr('conv1.weight').transpose(2, 3, 1, 0))}
    else:
        params['conv1'] = conv('conv1')
    params['bn1'], stats['bn1'] = bn('bn1')
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    for stage, n in enumerate(blocks):
        for b in range(n):
            src = f'layer{stage + 1}.{b}'
            dst = f'layer{stage + 1}_{b}'
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                p[f'conv{i}'] = conv(f'{src}.conv{i}')
                p[f'bn{i}'], s[f'bn{i}'] = bn(f'{src}.bn{i}')
            if f'{src}.downsample.0.weight' in state_dict:
                p['downsample_conv'] = conv(f'{src}.downsample.0')
                p['downsample_bn'], s['downsample_bn'] = bn(
                    f'{src}.downsample.1')
            params[dst] = p
            stats[dst] = s
    return params, stats


def load_pretrained_backbone(variables, state_dict, depth=50,
                             stem_space_to_depth=True):
    """Merge converted torchvision weights into a detector's variables."""
    params, stats = convert_torch_resnet(state_dict, depth,
                                         stem_space_to_depth)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    new_vars = dict(new_vars)
    p = dict(new_vars['params'])
    p['backbone'] = jax.tree_util.tree_map(
        lambda a, b: np.asarray(b, dtype=np.asarray(a).dtype),
        dict(p['backbone']), params)
    new_vars['params'] = p
    bs = dict(new_vars.get('batch_stats', {}))
    bs['backbone'] = jax.tree_util.tree_map(
        lambda a, b: np.asarray(b, dtype=np.asarray(a).dtype),
        dict(bs['backbone']), stats)
    new_vars['batch_stats'] = bs
    return new_vars
