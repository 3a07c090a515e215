"""Load the reference implementation's pure-torch/C++ code as parity oracles.

The upstream reference lives read-only at /root/reference and depends on
mmcv/mmdet (not installed). This module stubs just enough of that import
surface to execute the reference's pure-torch math (coders, rtransforms)
and to compile its CPU extensions (rnms_cpu, nms_rotated_cpu,
polygon_geo_cpu) with torch.utils.cpp_extension. Everything here is
test-only oracle plumbing; nothing ships in the framework.

Oracles provided:
  ref_rbbox_coder()   -> /root/reference/r3det/core/bbox/coder/
                         delta_xywha_rbbox_coder.py (module)
  ref_hbbox_coder()   -> .../delta_xywha_hbbox_coder.py (module)
  ref_rtransforms()   -> .../rtransforms.py (module)
  build_rnms_cpu()    -> compiled rnms_cpu (v1 NMS, rnms/src/rcpu)
  build_nms_rotated_cpu() -> compiled nms_rotated_cpu (v3 NMS)
  build_polygon_geo() -> compiled polygon_geo_cpu (f64 polygon IoU)
"""
import functools
import importlib.util
import os
import sys
import types

REF = '/root/reference'
BUILD_ROOT = os.path.join(os.path.dirname(__file__), os.pardir,
                          '.ref_oracle_build')


def _module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _ensure_stubs():
    if getattr(sys.modules.get('mmcv'), '_r3det_tpu_stub', False):
        return

    # the reference predates numpy 1.24 (poly2obb_np_v2 uses the removed
    # np.float alias, rtransforms.py:330); restore it for the oracle
    import numpy as np
    if not hasattr(np, 'float'):
        np.float = float

    mmcv = _module('mmcv')
    mmcv._r3det_tpu_stub = True

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(fn):
            return fn
        return deco
    mmcv.jit = jit

    class _Registry:
        def register_module(self, *args, **kwargs):
            if args and isinstance(args[0], type):
                return args[0]

            def deco(obj):
                return obj
            return deco

    _module('mmdet')
    _module('mmdet.core')
    _module('mmdet.core.bbox')
    builder = _module('mmdet.core.bbox.builder')
    builder.BBOX_CODERS = _Registry()
    _module('mmdet.core.bbox.coder')
    base = _module('mmdet.core.bbox.coder.base_bbox_coder')

    class BaseBBoxCoder:
        def __init__(self, *args, **kwargs):
            pass
    base.BaseBBoxCoder = BaseBBoxCoder

    # rtransforms does `from r3det.ops import convex_sort` (unused at
    # module scope beyond the import itself)
    r3 = _module('r3det')
    ops = _module('r3det.ops')

    def convex_sort(*args, **kwargs):
        raise RuntimeError('convex_sort oracle stub: CUDA-only upstream')
    ops.convex_sort = convex_sort
    r3.ops = ops


def _load_ref(relpath, name):
    _ensure_stubs()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_rbbox_coder():
    return _load_ref('r3det/core/bbox/coder/delta_xywha_rbbox_coder.py',
                     'ref_delta_xywha_rbbox_coder')


def ref_hbbox_coder():
    return _load_ref('r3det/core/bbox/coder/delta_xywha_hbbox_coder.py',
                     'ref_delta_xywha_hbbox_coder')


def ref_rtransforms():
    return _load_ref('r3det/core/bbox/rtransforms.py', 'ref_rtransforms')


def ref_pipelines():
    """Reference dataset pipeline classes (RResize / RRandomFlip /
    PolyRandomRotate), with mmdet base classes stubbed and r3det.core
    geometry forwarded to the reference's own rtransforms module."""
    _ensure_stubs()
    rt = ref_rtransforms()
    import numpy as np
    import torch

    core = _module('r3det.core')

    def norm_angle(angle, version):
        return rt.norm_angle(torch.from_numpy(np.asarray(angle)),
                             version).numpy()
    core.norm_angle = norm_angle
    core.obb2poly_np = rt.obb2poly_np
    core.poly2obb_np = rt.poly2obb_np
    sys.modules['r3det'].core = core

    dsb = _module('mmdet.datasets')
    builder = _module('mmdet.datasets.builder')

    class _Registry:
        def register_module(self, *a, **k):
            if a and isinstance(a[0], type):
                return a[0]

            def deco(obj):
                return obj
            return deco
    builder.PIPELINES = _Registry()
    _module('mmdet.datasets.pipelines')
    tr = _module('mmdet.datasets.pipelines.transforms')

    class _Base:
        def __init__(self, *a, **k):
            pass
    tr.Resize = _Base
    tr.RandomFlip = _Base
    dsb.builder = builder

    return _load_ref('r3det/datasets/pipelines/rtransforms.py',
                     'ref_pipelines_rtransforms')


# ---------------------------------------------------------------------------
# Reference CPU extensions (compiled on demand, cached in .ref_oracle_build)
# ---------------------------------------------------------------------------

def _cpp_load(name, sources, binding_src=None, api_renames=None):
    """Compile reference C++ sources as a test oracle.

    api_renames: optional {old: new} replacements applied to a copy of
    each source in the build dir — ONLY for deprecated-torch-API renames
    (e.g. ``.type()`` -> ``.scalar_type()``) so pre-1.5-era code builds
    against torch 2.x. Algorithmic content is never touched.
    """
    from torch.utils import cpp_extension
    build_dir = os.path.join(BUILD_ROOT, name)
    os.makedirs(build_dir, exist_ok=True)
    include_dirs = sorted({os.path.dirname(s) for s in sources})
    if api_renames:
        patched = []
        for src in sources:
            text = open(src).read()
            for old, new in api_renames.items():
                text = text.replace(old, new)
            dst = os.path.join(build_dir,
                               'patched_' + os.path.basename(src))
            if not os.path.exists(dst) or open(dst).read() != text:
                with open(dst, 'w') as f:
                    f.write(text)
            patched.append(dst)
        sources = patched
    if binding_src is not None:
        binding_path = os.path.join(build_dir, f'{name}_binding.cpp')
        if (not os.path.exists(binding_path) or
                open(binding_path).read() != binding_src):
            with open(binding_path, 'w') as f:
                f.write(binding_src)
        sources = sources + [binding_path]
    return cpp_extension.load(name=name, sources=sources,
                              build_directory=build_dir,
                              extra_include_paths=include_dirs,
                              verbose=False)


@functools.cache
def build_rnms_cpu():
    """Reference v1 rotated NMS (rnms/src/rcpu/rnms_cpu.cpp)."""
    binding = (
        '#include <torch/extension.h>\n'
        'torch::Tensor rnms_cpu(const torch::Tensor &dets_tsr, '
        'const float threshold);\n'
        'PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) '
        '{ m.def("rnms", &rnms_cpu, "reference v1 rotated NMS (CPU)"); }\n')
    return _cpp_load(
        'ref_rnms_cpu',
        [os.path.join(REF, 'r3det/ops/rnms/src/rcpu/rnms_cpu.cpp')],
        binding)


@functools.cache
def build_nms_rotated_cpu():
    """Reference v3 rotated NMS (nms_rotated/src/nms_rotated_cpu.cpp)."""
    binding = (
        '#include <torch/extension.h>\n'
        'at::Tensor nms_rotated_cpu(const at::Tensor& dets, '
        'const at::Tensor& scores, const float iou_threshold);\n'
        'PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) '
        '{ m.def("nms_rotated", &nms_rotated_cpu, '
        '"reference v3 rotated NMS (CPU)"); }\n')
    return _cpp_load(
        'ref_nms_rotated_cpu',
        [os.path.join(REF,
                      'r3det/ops/nms_rotated/src/nms_rotated_cpu.cpp')],
        binding)


@functools.cache
def build_polygon_geo():
    """Reference f64 polygon IoU (polygon_geo/src/polygon_geo_cpu.cpp).

    Ships its own PYBIND11_MODULE; no binding shim needed.
    """
    return _cpp_load(
        'ref_polygon_geo_cpu',
        [os.path.join(REF, 'r3det/ops/polygon_geo/src/polygon_geo_cpu.cpp')])
