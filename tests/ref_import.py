"""Import the REAL reference implementation (/root/reference) under CPU torch.

The reference's only hard external deps beyond torch/numpy/scipy/cv2/PIL are
torchvision (box_area, IntermediateLayerGetter, version probing) and the
compiled CUDA extension `MultiScaleDeformableAttention`; both are stubbed
here with just enough surface for module import.  A few reference modules
also hardcode `.cuda()` / `device='cuda'` (monodetr.py:440,452-455,
ddn_loss.py:32); those are redirected to CPU via narrow monkeypatches so the
math itself can run as an executable golden.

Used by tests/test_golden_reference.py — the strongest AP-parity proxy
available without KITTI data: if any of this repo's matcher / criterion /
decode / target-encoding semantics drift from the reference, those tests
fail against the reference's own code, not a hand-derived restatement.
"""

import sys
import types

import torch

REF_ROOT = "/root/reference"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.16.0"
    tv._is_tracing = lambda: False

    ops = types.ModuleType("torchvision.ops")
    boxes_m = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    boxes_m.box_area = box_area
    misc_m = types.ModuleType("torchvision.ops.misc")
    ops.boxes = boxes_m
    ops.misc = misc_m

    # pd.py does `from torchvision import transforms` but only references it
    # in a docstring
    transforms_m = types.ModuleType("torchvision.transforms")
    tv.transforms = transforms_m

    models_m = types.ModuleType("torchvision.models")
    utils_m = types.ModuleType("torchvision.models._utils")

    class IntermediateLayerGetter:  # only needed at build_backbone() time
        def __init__(self, *a, **k):
            raise NotImplementedError("stub")

    utils_m.IntermediateLayerGetter = IntermediateLayerGetter
    models_m._utils = utils_m
    tv.ops = ops
    tv.models = models_m

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_m
    sys.modules["torchvision.ops.misc"] = misc_m
    sys.modules["torchvision.models"] = models_m
    sys.modules["torchvision.models._utils"] = utils_m
    sys.modules["torchvision.transforms"] = transforms_m


def _stub_numba():
    """numba isn't installed; the reference's kitti_dataset.py transitively
    imports its numba/cuda-jitted eval at module scope.  Import-time only —
    the jitted functions are never *called* by the goldens."""
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def _jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    numba.jit = _jit
    numba.njit = _jit
    for name in ("float32", "float64", "int32", "int64", "boolean"):
        setattr(numba, name, None)

    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _jit

    class _LocalArray:
        @staticmethod
        def array(shape, dtype=None):
            raise NotImplementedError("numba stub")

    cuda.local = _LocalArray
    cuda.shared = _LocalArray
    cuda.syncthreads = lambda: None
    numba.cuda = cuda
    sys.modules["numba"] = numba
    sys.modules["numba.cuda"] = cuda


def _stub_skimage():
    """kitti_common.py does `from skimage import io` for an imread the golden
    paths never call."""
    if "skimage" in sys.modules:
        return
    skimage = types.ModuleType("skimage")
    io_m = types.ModuleType("skimage.io")

    def imread(*a, **k):
        raise NotImplementedError("skimage stub")

    io_m.imread = imread
    skimage.io = io_m
    sys.modules["skimage"] = skimage
    sys.modules["skimage.io"] = io_m


def _stub_msda_ext():
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention"
        )


def _patch_cuda_to_cpu():
    if getattr(torch, "_golden_cpu_patched", False):
        return
    torch._golden_cpu_patched = True

    _orig_tensor_cuda = torch.Tensor.cuda

    def _cuda(self, *a, **k):
        return self

    torch.Tensor.cuda = _cuda

    _orig_tensor = torch.tensor

    def _tensor(*a, **k):
        dev = k.get("device")
        if dev == "cuda" or (isinstance(dev, torch.device) and dev.type == "cuda"):
            k["device"] = "cpu"
        return _orig_tensor(*a, **k)

    torch.tensor = _tensor
    torch.cuda.current_device = lambda: torch.device("cpu")


def _shim_old_torch_names():
    """Names the reference's vendored (torch-1.x era) MHA imports that newer
    torch removed."""
    import torch.nn.modules.linear as linear_mod

    if not hasattr(linear_mod, "_LinearWithBias"):

        class _LinearWithBias(torch.nn.Linear):
            def __init__(self, in_features, out_features):
                super().__init__(in_features, out_features, bias=True)

        linear_mod._LinearWithBias = _LinearWithBias

    if "torch._overrides" not in sys.modules:
        ov = types.ModuleType("torch._overrides")
        from torch.overrides import handle_torch_function, has_torch_function

        ov.has_torch_function = has_torch_function
        ov.handle_torch_function = handle_torch_function
        sys.modules["torch._overrides"] = ov


def install():
    _stub_torchvision()
    _stub_numba()
    _stub_skimage()
    _stub_msda_ext()
    _patch_cuda_to_cpu()
    _shim_old_torch_names()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
