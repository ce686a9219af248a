"""Import the reference's torch modules from /root/reference with tiny
dependency shims, for golden numeric-parity tests.

The reference modules import timm (DropPath/to_2tuple/trunc_normal_ — ~15
lines of math), fvcore (c2_xavier_fill/c2_msra_fill — ~8 lines), addict
(attr-dict), torchvision (only `_is_tracing` on the import path we touch),
detectron2 (comm.get_world_size + point_rend point features, which the
criterion immediately re-imports from its own vendored copy at
Mask2Former_Simplify/utils/point_features.py), and the compiled
MultiScaleDeformableAttention CUDA extension (whose *call* is wrapped in a
bare ``except`` at ms_deform_attn.py:112-119 that falls back to the
pure-torch oracle — so a raising stub exercises exactly the reference's own
CPU path). None of these shims contain reference code; they re-implement
public, well-known utility semantics.

``psalm.model/__init__.py`` eagerly imports the full PSALM model (llava_phi
-> transformers/detectron2 structures); we bypass only that __init__ by
registering a namespace-style package, so individual submodules import with
their real package context (relative imports work).
"""

import math
import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference"


def _module(name):
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = m
    return m


def _install_timm():
    timm = _module("timm")
    models = _module("timm.models")
    layers = _module("timm.models.layers")
    timm.models = models
    models.layers = layers

    class DropPath(nn.Module):
        """Per-sample stochastic depth (identity in eval mode)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rand.floor_()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean, std, a, b)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_


def _install_fvcore():
    fvcore = _module("fvcore")
    fnn = _module("fvcore.nn")
    wi = _module("fvcore.nn.weight_init")
    fvcore.nn = fnn
    fnn.weight_init = wi

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill


def _install_addict():
    addict = _module("addict")

    class Dict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    addict.Dict = Dict


def _install_torchvision():
    tv = _module("torchvision")
    tv._is_tracing = lambda: False
    ops = _module("torchvision.ops")
    tv.ops = ops


def _install_msda_stub():
    msda = _module("MultiScaleDeformableAttention")

    def _raise(*a, **k):
        raise RuntimeError("CUDA MSDeformAttn not available; the reference "
                           "wrapper falls back to its pure-torch oracle")

    msda.ms_deform_attn_forward = _raise
    msda.ms_deform_attn_backward = _raise


def _install_detectron2():
    d2 = _module("detectron2")
    utils = _module("detectron2.utils")
    comm = _module("detectron2.utils.comm")
    d2.utils = utils
    utils.comm = comm
    comm.get_world_size = lambda *a, **k: 1

    memory = _module("detectron2.utils.memory")
    utils.memory = memory

    def retry_if_cuda_oom(fn):
        return fn

    memory.retry_if_cuda_oom = retry_if_cuda_oom

    projects = _module("detectron2.projects")
    pr = _module("detectron2.projects.point_rend")
    pf = _module("detectron2.projects.point_rend.point_features")
    d2.projects = projects
    projects.point_rend = pr
    pr.point_features = pf

    def point_sample(input, point_coords, **kwargs):
        """detectron2's public point_sample semantics: grid_sample at
        [0,1]-normalized coords with an added dim when coords are 3-D."""
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = torch.nn.functional.grid_sample(
            input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(*a, **k):
        raise NotImplementedError(
            "use the reference's vendored copy "
            "(Mask2Former_Simplify/utils/point_features.py)")

    pf.point_sample = point_sample
    pf.get_uncertain_point_coords_with_randomness = \
        get_uncertain_point_coords_with_randomness

    # structures / postprocessing, only needed to satisfy llava_phi imports
    structures = _module("detectron2.structures")
    d2.structures = structures

    class Instances:
        def __init__(self, image_size, **fields):
            self._image_size = tuple(image_size)
            self._fields = {}
            for k, v in fields.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def set(self, k, v):
            self._fields[k] = v

        def __setattr__(self, k, v):
            if k.startswith("_"):
                super().__setattr__(k, v)
            else:
                self._fields[k] = v

        def __getattr__(self, k):
            if k.startswith("_") or k not in self.__dict__.get("_fields", {}):
                raise AttributeError(k)
            return self._fields[k]

        def has(self, k):
            return k in self._fields

        def to(self, *a, **k):
            out = Instances(self._image_size)
            for key, v in self._fields.items():
                out.set(key, v.to(*a, **k) if hasattr(v, "to") else v)
            return out

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

        def to(self, *a, **k):
            return Boxes(self.tensor.to(*a, **k))

        def __len__(self):
            return self.tensor.shape[0]

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

        def get_bounding_boxes(self):
            raise NotImplementedError

    class ImageList:
        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        @staticmethod
        def from_tensors(tensors, size_divisibility=0):
            sizes = [(t.shape[-2], t.shape[-1]) for t in tensors]
            max_h = max(s[0] for s in sizes)
            max_w = max(s[1] for s in sizes)
            if size_divisibility > 0:
                d = size_divisibility
                max_h = (max_h + d - 1) // d * d
                max_w = (max_w + d - 1) // d * d
            batch = tensors[0].new_zeros(
                (len(tensors),) + tensors[0].shape[:-2] + (max_h, max_w))
            for img, t in zip(batch, tensors):
                img[..., :t.shape[-2], :t.shape[-1]].copy_(t)
            return ImageList(batch, sizes)

    structures.Instances = Instances
    structures.Boxes = Boxes
    structures.BitMasks = BitMasks
    structures.ImageList = ImageList

    modeling = _module("detectron2.modeling")
    postproc = _module("detectron2.modeling.postprocessing")
    d2.modeling = modeling
    modeling.postprocessing = postproc

    def sem_seg_postprocess(result, img_size, output_height, output_width):
        result = result[:, : img_size[0], : img_size[1]].expand(1, -1, -1, -1)
        result = torch.nn.functional.interpolate(
            result, size=(output_height, output_width), mode="bilinear",
            align_corners=False)[0]
        return result

    postproc.sem_seg_postprocess = sem_seg_postprocess

    data = _module("detectron2.data")
    d2.data = data
    transforms = _module("detectron2.data.transforms")
    data.transforms = transforms
    # mapper __init__ constructs these; they are only *applied* per-sample
    class _DummyTransform:
        def __init__(self, *a, **k):
            pass

    for name in ("ResizeShortestEdge", "FixedSizeCrop", "RandomFlip",
                 "AugmentationList", "AugInput"):
        setattr(transforms, name, _DummyTransform)
    transforms.apply_transform_gens = None
    data.detection_utils = _module("detectron2.data.detection_utils")
    sys.modules["detectron2.data.detection_utils"] = data.detection_utils
    data.MetadataCatalog = None
    data.DatasetCatalog = None

    config = _module("detectron2.config")
    d2.config = config

    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func
        return lambda f: f

    config.configurable = configurable


def _install_pycocotools():
    """Raise-on-call stub: the mapper modules import encode/decode at module
    scope but only call them per-sample; the spine golden feeds tensors
    directly."""
    pc = _module("pycocotools")
    mask = _module("pycocotools.mask")
    pc.mask = mask

    def _unavailable(*a, **k):
        raise NotImplementedError("pycocotools stubbed in golden tests")

    mask.encode = _unavailable
    mask.decode = _unavailable
    mask.frPyObjects = _unavailable


def install_shims():
    if "timm" in sys.modules and hasattr(sys.modules["timm"], "models"):
        return
    _install_timm()
    _install_fvcore()
    _install_addict()
    _install_torchvision()
    _install_msda_stub()
    _install_detectron2()
    _install_pycocotools()

    # register the reference root + namespace packages that bypass the heavy
    # psalm.model __init__ (which imports the whole PSALM model eagerly)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    pm = _module("psalm.model")
    pm.__path__ = [REF_ROOT + "/psalm/model"]
    pm.__package__ = "psalm.model"


def load_ref(modname):
    """Import a reference module (dotted path under psalm.*)."""
    install_shims()
    import importlib
    return importlib.import_module(modname)
