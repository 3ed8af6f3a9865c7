"""Load reference model files as parity oracles.

torchvision is not installed in this image, so the reference modules
that import it get minimal stand-ins implementing the DOCUMENTED
semantics of the two entry points MTCNN actually uses:
  * torchvision.ops.boxes.batched_nms — greedy IoU NMS after the
    per-class coordinate-offset trick, descending score order;
  * torchvision.transforms.functional.to_tensor — HWC [0,255] ndarray
    -> CHW tensor (only reached by extract_face, which tests don't
    exercise through the oracle).

The reference package __init__ pulls in every model (including
torchvision-heavy ones), so modules are loaded individually under a
synthetic ``refmodels`` package rooted at /root/reference/models.
"""

import importlib
import sys
import types

REF_MODELS_DIR = "/root/reference/models"


def _greedy_nms_torch(boxes, scores, iou_threshold):
    import torch

    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    x1, y1, x2, y2 = boxes.unbind(1)
    areas = (x2 - x1) * (y2 - y1)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        w = (xx2 - xx1).clamp(min=0)
        h = (yy2 - yy1).clamp(min=0)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


def install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + 1)
        return _greedy_nms_torch(boxes + offsets[:, None], scores,
                                 iou_threshold)

    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod

    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def to_tensor(arr):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(arr)).transpose(2, 0, 1)
        ).float()

    functional.to_tensor = to_tensor
    transforms.functional = functional

    models_mod = types.ModuleType("torchvision.models")
    models_utils = types.ModuleType("torchvision.models.utils")

    def load_state_dict_from_url(*args, **kwargs):
        raise RuntimeError("no network in tests")

    models_utils.load_state_dict_from_url = load_state_dict_from_url
    models_mod.utils = models_utils

    # torchvision.models._utils.IntermediateLayerGetter per its
    # documented contract: run named children in order, collect the
    # outputs of the requested layers under their new names.
    models__utils = types.ModuleType("torchvision.models._utils")

    class IntermediateLayerGetter(torch.nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = {str(k): str(v) for k, v in return_layers.items()}
            layers = {}
            remaining = dict(orig)
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            from collections import OrderedDict

            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    models__utils.IntermediateLayerGetter = IntermediateLayerGetter
    models_mod._utils = models__utils

    detection_mod = types.ModuleType("torchvision.models.detection")
    backbone_utils = types.ModuleType(
        "torchvision.models.detection.backbone_utils"
    )
    detection_mod.backbone_utils = backbone_utils
    models_mod.detection = detection_mod

    tv.ops = ops
    tv.transforms = transforms
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.utils"] = models_utils
    sys.modules["torchvision.models._utils"] = models__utils
    sys.modules["torchvision.models.detection"] = detection_mod
    sys.modules["torchvision.models.detection.backbone_utils"] = \
        backbone_utils


def install_torchvision_resnet50():
    """Give the torchvision stub a real ``models.resnet50`` with the
    torchvision key layout, backed by the reference's own stock ResNet
    implementation (resnet_2_branch_utils/resnet.py:68-165), so the
    RetinaFace cfg_re50 oracle can build without real torchvision."""
    install_torchvision_stub()
    models_mod = sys.modules["torchvision.models"]
    if hasattr(models_mod, "resnet50"):
        return
    resnet = load_ref_module("resnet_2_branch_utils.resnet")

    def resnet50(pretrained=False, **kwargs):
        assert not pretrained, "no network in tests"
        return resnet.ResNet(resnet.Bottleneck, [3, 4, 6, 3], **kwargs)

    models_mod.resnet50 = resnet50


def load_ref_module(name):
    """Import e.g. 'mtcnn' or 'mtcnn_utils.detect_face' from the
    reference models dir under the 'refmodels' package."""
    install_torchvision_stub()
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_MODELS_DIR]
        sys.modules["refmodels"] = pkg
    return importlib.import_module(f"refmodels.{name}")
