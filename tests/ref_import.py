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

    # Functional stand-ins (torchvision isn't installed): a faithful
    # torchvision-layout ResNet (same module names/shapes as
    # torchvision.models.resnet50/101, so reference state dicts line up
    # key-for-key) and a working IntermediateLayerGetter.  Both are needed
    # to RUN the reference model as an executable golden, not just import
    # it (backbone.py:82,100-102).
    from collections import OrderedDict

    import torch.nn as tnn

    class IntermediateLayerGetter(tnn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = dict(return_layers)
            remaining = set(return_layers)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                remaining.discard(name)
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    class _Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     dilation=1, norm_layer=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = norm_layer(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=dilation, dilation=dilation,
                                    bias=False)
            self.bn2 = norm_layer(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = norm_layer(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idn)

    class _ResNet(tnn.Module):
        def __init__(self, layers, norm_layer,
                     replace_stride_with_dilation=(False, False, False)):
            super().__init__()
            self.inplanes, self.dilation = 64, 1
            self._norm_layer = norm_layer
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(
                128, layers[1], 2, replace_stride_with_dilation[0])
            self.layer3 = self._make_layer(
                256, layers[2], 2, replace_stride_with_dilation[1])
            self.layer4 = self._make_layer(
                512, layers[3], 2, replace_stride_with_dilation[2])
            self.fc = tnn.Linear(512 * 4, 1000)

        def _make_layer(self, planes, blocks, stride=1, dilate=False):
            nl = self._norm_layer
            prev_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = tnn.Sequential(
                    tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                               bias=False),
                    nl(planes * 4),
                )
            mods = [_Bottleneck(self.inplanes, planes, stride, downsample,
                                prev_dilation, nl)]
            self.inplanes = planes * 4
            mods += [_Bottleneck(self.inplanes, planes,
                                 dilation=self.dilation, norm_layer=nl)
                     for _ in range(1, blocks)]
            return tnn.Sequential(*mods)

        def forward(self, x):  # classification head; unused by the getter
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(
                tnn.functional.adaptive_avg_pool2d(x, 1), 1))

    def _resnet(layers):
        def ctor(replace_stride_with_dilation=(False, False, False),
                 pretrained=False, norm_layer=tnn.BatchNorm2d, **kw):
            # pretrained ignored: goldens copy explicit state dicts anyway
            return _ResNet(layers, norm_layer, replace_stride_with_dilation)

        return ctor

    models_m.resnet50 = _resnet([3, 4, 6, 3])
    models_m.resnet101 = _resnet([3, 4, 23, 3])
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


def patch_msda_to_pytorch_core():
    """Route the reference's MSDeformAttnFunction (CUDA extension) through
    its own pure-torch fallback `ms_deform_attn_core_pytorch`
    (ops/functions/ms_deform_attn_func.py:41-61) so the full model can run
    on CPU.  Call after install()."""
    import lib.models.monodetr.ops.functions.ms_deform_attn_func as f
    import lib.models.monodetr.ops.modules.ms_deform_attn as m

    class _Fn:
        @staticmethod
        def apply(value, spatial_shapes, level_start_index,
                  sampling_locations, attention_weights, im2col_step):
            return f.ms_deform_attn_core_pytorch(
                value, spatial_shapes, sampling_locations, attention_weights)

    m.MSDeformAttnFunction = _Fn
    f.MSDeformAttnFunction = _Fn


def install():
    _stub_torchvision()
    _stub_numba()
    _stub_skimage()
    _stub_msda_ext()
    _patch_cuda_to_cpu()
    _shim_old_torch_names()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
