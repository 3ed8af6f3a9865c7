"""Model registry.

Mirrors the reference registry surface (/root/reference/models/
__init__.py:1-7): config files name components by these strings and the
CLIs resolve them reflectively. ``build_model(name, **args)`` returns a
``(module, variables)`` pair — flax modules are stateless, so the
pretrained-weight loading the torch constructors did implicitly happens
here explicitly via the torch->flax converter.
"""

from .layers import coerce_dtype
from .mlp import MLPModel
from .inception_resnet_v1 import InceptionResnetV1, build_inception_resnet_v1
from .iresnet import IResNet, iresnet34, iresnet50, iresnet100, \
    build_iresnet
from .resnet_encoder import ResNetSE, resnet101, build_resnet_se, \
    ArcMarginModel
from .mtcnn import MTCNN, PNet, RNet, ONet
from .retinaface import RetinaFace
from .resnet_2_branch import ResNet2Branch, resnet_2branch_50, \
    build_resnet_2branch_50
from .fan import FAN, FANLandmarker, build_fan


def build_model(name, **args):
    """Instantiate a model (and its pretrained variables when the args
    ask for them) from a registry name. Returns (module, variables);
    variables is None when no pretrained source was requested (caller
    initialises)."""
    builders = {
        "MLPModel": _build_mlp,
        "InceptionResnetV1": build_inception_resnet_v1,
        "iresnet34": lambda **kw: build_iresnet(34, **kw),
        "iresnet50": lambda **kw: build_iresnet(50, **kw),
        "iresnet100": lambda **kw: build_iresnet(100, **kw),
        "resnet101": build_resnet_se,
        "resnet_2branch_50": build_resnet_2branch_50,
    }
    if name not in builders:
        raise KeyError(f"Unknown model '{name}'")
    # reference config files carry torch-hub's download-progress flag
    # (cfg/embedding/iresnet100_enc.json); it has no meaning here
    args.pop("progress", None)
    if "dtype" in args:
        args["dtype"] = coerce_dtype(args["dtype"])
    return builders[name](**args)


def _build_mlp(input_dim, num_classes, **kwargs):
    return MLPModel(input_dim=input_dim, num_classes=num_classes), None


def build_detector(name, **args):
    """Detector factory (MTCNN / RetinaFace), mirroring the reference's
    getattr(models, args.detection)(**det_args) wiring."""
    detectors = {"MTCNN": MTCNN, "RetinaFace": RetinaFace}
    if name not in detectors:
        raise KeyError(f"Unknown detector '{name}'")
    return detectors[name](**args)


__all__ = [
    "MLPModel",
    "InceptionResnetV1",
    "IResNet",
    "iresnet34",
    "iresnet50",
    "iresnet100",
    "ResNetSE",
    "resnet101",
    "ArcMarginModel",
    "MTCNN",
    "PNet",
    "RNet",
    "ONet",
    "RetinaFace",
    "ResNet2Branch",
    "resnet_2branch_50",
    "FAN",
    "FANLandmarker",
    "build_fan",
    "build_model",
    "build_detector",
]
