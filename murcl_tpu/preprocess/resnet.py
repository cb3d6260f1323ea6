"""Flax image encoders (ResNet18/50, VGG16) + torchvision weight import.

The reference's feature extractor is a torchvision ImageNet backbone with
the classification head stripped (``wsi_processing/extract_features.py:15-33``):
``resnet18``/``resnet50`` up to global average pooling (512-/2048-d), or
``vgg16`` with the last 3 classifier layers removed (4096-d). Patches are
preprocessed with ``ToTensor`` ONLY — **no ImageNet normalization**
(``:38-44``) — reproduced in :func:`murcl_tpu.preprocess.extract`.

These are inference-only encoders: BatchNorm runs with frozen running
statistics (the reference never trains them), so BN folds into a scale+bias
— cheap and exactly equivalent. Weights come from torchvision checkpoints
when torch is available (:func:`load_torchvision_weights`); random init
otherwise (tests, shape checks).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) * gamma / sqrt(var+eps) + beta."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = gamma * jax.lax.rsqrt(var + self.eps)
        return x * inv + (beta - mean * inv)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, name="down_conv")(identity)
            identity = FrozenBatchNorm(self.features, name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_features = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn2")(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(out_features, name="bn3")(y)
        if identity.shape[-1] != out_features or self.stride != 1:
            identity = nn.Conv(out_features, (1, 1), (self.stride, self.stride),
                               use_bias=False, name="down_conv")(identity)
            identity = FrozenBatchNorm(out_features, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """ResNet up to global average pooling. NHWC in, (B, feat_dim) out."""

    stage_sizes: Sequence[int]
    block: Any
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(width, stride, name=f"layer{i + 1}_{j}")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool


def adaptive_avg_pool2d(x, out_hw):
    """torch ``AdaptiveAvgPool2d`` semantics on NHWC: per output cell,
    average the window ``[floor(i*in/out), ceil((i+1)*in/out))``."""
    oh, ow = out_hw
    b, h, w, c = x.shape
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


class VGG16Encoder(nn.Module):
    """VGG16 features + adaptive avgpool(7,7) + classifier[:4] (4096-d).

    The adaptive pool matches torchvision for any input size (the
    reference feeds 256x256 patches -> 8x8 conv maps -> pooled to 7x7,
    which the ported ``classifier.0`` weights require).
    """

    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")

    @nn.compact
    def __call__(self, x):
        conv_i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                                    name=f"conv{conv_i}")(x))
                conv_i += 1
        x = adaptive_avg_pool2d(x, (7, 7))
        b = x.shape[0]
        # torch flattens CHW; transpose to match the fc weight layout
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        return x


ENCODERS: Dict[str, Any] = {
    "resnet18": (partial(ResNetEncoder, stage_sizes=(2, 2, 2, 2), block=BasicBlock), 512),
    "resnet50": (partial(ResNetEncoder, stage_sizes=(3, 4, 6, 3), block=Bottleneck), 2048),
    "vgg16": (VGG16Encoder, 4096),
}


def create_encoder(name: str = "resnet18"):
    """Returns ``(module, feature_dim)``; reference ``create_encoder`` parity."""
    if name not in ENCODERS:
        raise ValueError(f"image encoder {name!r} not supported")
    ctor, dim = ENCODERS[name]
    return ctor(), dim


# ---------------------------------------------------------------------------
# torchvision weight import
# ---------------------------------------------------------------------------
def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn_tree(sd, prefix) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def resnet_params_from_torch(state_dict, stage_sizes: Sequence[int],
                             bottleneck: bool) -> dict:
    """Map a torchvision resnet state_dict onto the flax ResNetEncoder tree."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in state_dict.items()}
    p: dict = {
        "conv1": {"kernel": _conv_kernel(sd["conv1.weight"])},
        "bn1": _bn_tree(sd, "bn1"),
    }
    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            blk: dict = {}
            for c in range(1, n_convs + 1):
                blk[f"conv{c}"] = {"kernel": _conv_kernel(sd[f"{t}.conv{c}.weight"])}
                blk[f"bn{c}"] = _bn_tree(sd, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv_kernel(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = _bn_tree(sd, f"{t}.downsample.1")
            p[f"layer{i + 1}_{j}"] = blk
    return {"params": p}


def vgg16_params_from_torch(state_dict) -> dict:
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in state_dict.items()}
    p: dict = {}
    conv_i = 0
    for k in sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda s: int(s.split(".")[1]),
    ):
        idx = k.split(".")[1]
        p[f"conv{conv_i}"] = {
            "kernel": _conv_kernel(sd[f"features.{idx}.weight"]),
            "bias": np.asarray(sd[f"features.{idx}.bias"]),
        }
        conv_i += 1
    for flax_name, t in (("fc1", "classifier.0"), ("fc2", "classifier.3")):
        p[flax_name] = {
            "kernel": np.asarray(sd[f"{t}.weight"]).T,
            "bias": np.asarray(sd[f"{t}.bias"]),
        }
    return {"params": p}


def load_torchvision_weights(name: str):
    """Pretrained params via torchvision (ImageNet); raises if unavailable."""
    import torchvision.models as tvm

    if name == "resnet18":
        sd = tvm.resnet18(weights=tvm.ResNet18_Weights.IMAGENET1K_V1).state_dict()
        return resnet_params_from_torch(sd, (2, 2, 2, 2), bottleneck=False)
    if name == "resnet50":
        sd = tvm.resnet50(weights=tvm.ResNet50_Weights.IMAGENET1K_V1).state_dict()
        return resnet_params_from_torch(sd, (3, 4, 6, 3), bottleneck=True)
    if name == "vgg16":
        sd = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_V1).state_dict()
        return vgg16_params_from_torch(sd)
    raise ValueError(name)
