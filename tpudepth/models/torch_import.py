"""torch state_dict -> flax params converters.

Gives the framework the reference's "pretrained=True" capability without a
torch runtime dependency in the hot path: torchvision MobileNetV3 weights
(``src/model_mobileV3_large_SAM.py:165``), the DDRNet ImageNet checkpoint
(``src/GuideDepth/model/DDRNet_23_slim.py:357-365``), GuideDepth released
checkpoints (``src/GuideDepth/model/loader.py:9-12``), and the reference's own
training checkpoints (``src/train.py:147-153``) all convert to tpudepth param
trees. The converse of ``src/load_weight_from_keras.py``'s Keras->torch
pattern.

All converters take ``{name: np.ndarray}`` (call :func:`state_dict_to_numpy`
on a loaded ``.pth``) and return ``{'params': ..., 'batch_stats': ...}``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Convert a torch state_dict (possibly nested in a checkpoint dict) to
    {name: np.ndarray}."""
    out = {}
    for k, v in state_dict.items():
        # copy: tensor.numpy() aliases torch storage, and jnp.asarray on CPU
        # aliases numpy — without the copy, training the torch model after
        # conversion would silently mutate the converted jax params.
        out[k] = np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _dw_conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch depthwise (O, 1, H, W) -> flax HWIO with feature_group_count=O:
    # flax expects (H, W, in/groups=1, O)
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Builder:
    """Accumulates params/batch_stats while translating torch names."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = dict(sd)
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used = set()

    def _get(self, name: str) -> np.ndarray:
        self.used.add(name)
        return self.sd[name]

    def conv(self, flax_path: str, torch_prefix: str, bias: bool = None):
        w = self._get(f"{torch_prefix}.weight")
        path = tuple(flax_path.split("/")) + ("Conv_0",)
        _set(self.params, path + ("kernel",), _conv_kernel(w))
        has_bias = bias if bias is not None else (f"{torch_prefix}.bias" in self.sd)
        if has_bias:
            _set(self.params, path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def conv_transpose(self, flax_path: str, torch_prefix: str):
        # torch ConvTranspose2d weight: (in, out, H, W) -> flax (H, W, in, out)
        w = self._get(f"{torch_prefix}.weight")
        path = tuple(flax_path.split("/")) + ("ConvTranspose_0",)
        # flax ConvTranspose flips spatial dims relative to torch's correlation
        _set(self.params, path + ("kernel",), np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
        if f"{torch_prefix}.bias" in self.sd:
            _set(self.params, path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def bn(self, flax_path: str, torch_prefix: str):
        path = tuple(flax_path.split("/")) + ("BatchNorm_0",)
        _set(self.params, path + ("scale",), self._get(f"{torch_prefix}.weight"))
        _set(self.params, path + ("bias",), self._get(f"{torch_prefix}.bias"))
        _set(self.stats, path + ("mean",), self._get(f"{torch_prefix}.running_mean"))
        _set(self.stats, path + ("var",), self._get(f"{torch_prefix}.running_var"))

    def dense(self, flax_path: str, torch_prefix: str):
        w = self._get(f"{torch_prefix}.weight")
        path = tuple(flax_path.split("/"))
        _set(self.params, path + ("kernel",), w.T)
        if f"{torch_prefix}.bias" in self.sd:
            _set(self.params, path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def layer_norm(self, flax_path: str, torch_prefix: str):
        path = tuple(flax_path.split("/")) + ("LayerNorm_0",)
        _set(self.params, path + ("scale",), self._get(f"{torch_prefix}.weight"))
        _set(self.params, path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def raw(self, flax_path: str, torch_name: str):
        _set(self.params, tuple(flax_path.split("/")), self._get(torch_name))

    def variables(self) -> Dict[str, Any]:
        import jax.numpy as jnp
        import jax

        def to_jnp(t):
            return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), t)

        out = {"params": to_jnp(self.params)}
        if self.stats:
            out["batch_stats"] = to_jnp(self.stats)
        return out


# ---------------------------------------------------------------------------
# DDRNet-23-slim / GuideDepth
# ---------------------------------------------------------------------------


def _basic_block(b: _Builder, fpath: str, tpath: str, has_downsample: bool):
    b.conv(f"{fpath}/conv1", f"{tpath}.conv1")
    b.bn(f"{fpath}/bn1", f"{tpath}.bn1")
    b.conv(f"{fpath}/conv2", f"{tpath}.conv2")
    b.bn(f"{fpath}/bn2", f"{tpath}.bn2")
    if has_downsample:
        b.conv(f"{fpath}/downsample_conv", f"{tpath}.downsample.0")
        b.bn(f"{fpath}/downsample_bn", f"{tpath}.downsample.1")


def _bottleneck(b: _Builder, fpath: str, tpath: str, has_downsample: bool):
    for i in (1, 2, 3):
        b.conv(f"{fpath}/conv{i}", f"{tpath}.conv{i}")
        b.bn(f"{fpath}/bn{i}", f"{tpath}.bn{i}")
    if has_downsample:
        b.conv(f"{fpath}/downsample_conv", f"{tpath}.downsample.0")
        b.bn(f"{fpath}/downsample_bn", f"{tpath}.downsample.1")


def _bn_relu_conv(b: _Builder, fpath: str, tpath: str, bn_idx: int, conv_idx: int):
    b.bn(f"{fpath}/bn", f"{tpath}.{bn_idx}")
    b.conv(f"{fpath}/conv", f"{tpath}.{conv_idx}")


def _ddrnet(b: _Builder, fprefix: str, tprefix: str):
    f = lambda p: f"{fprefix}/{p}" if fprefix else p
    t = lambda p: f"{tprefix}.{p}" if tprefix else p

    b.conv(f("stem_conv1"), t("conv1.0"))
    b.bn(f("stem_bn1"), t("conv1.1"))
    b.conv(f("stem_conv2"), t("conv1.3"))
    b.bn(f("stem_bn2"), t("conv1.4"))

    # (name, blocks, first-block-downsample)
    stages = [
        ("layer1", 2, False),
        ("layer2", 2, True),
        ("layer3", 2, True),
        ("layer4", 2, True),
        ("layer3_", 2, True),   # 64 -> 64 highres: in==out so ds only if ch differ
        ("layer4_", 2, False),
    ]
    # layer3_: in_planes = planes*2 (64), out = highres (64) -> no downsample
    stages[4] = ("layer3_", 2, False)
    for name, blocks, ds in stages:
        for i in range(blocks):
            _basic_block(b, f(f"{name}/block{i}"), t(f"{name}.{i}"), ds and i == 0)
    _bottleneck(b, f("layer5_/block0"), t("layer5_.0"), True)
    _bottleneck(b, f("layer5/block0"), t("layer5.0"), True)

    b.conv(f("compression3/conv"), t("compression3.0"))
    b.bn(f("compression3/bn"), t("compression3.1"))
    b.conv(f("compression4/conv"), t("compression4.0"))
    b.bn(f("compression4/bn"), t("compression4.1"))
    b.conv(f("down3/conv"), t("down3.0"))
    b.bn(f("down3/bn"), t("down3.1"))
    b.conv(f("down4_a/conv"), t("down4.0"))
    b.bn(f("down4_a/bn"), t("down4.1"))
    b.conv(f("down4_b/conv"), t("down4.3"))
    b.bn(f("down4_b/bn"), t("down4.4"))

    _bn_relu_conv(b, f("spp/scale0"), t("spp.scale0"), 0, 2)
    for i in (1, 2, 3, 4):
        _bn_relu_conv(b, f(f"spp/scale{i}"), t(f"spp.scale{i}"), 1, 3)
        _bn_relu_conv(b, f(f"spp/process{i}"), t(f"spp.process{i}"), 0, 2)
    _bn_relu_conv(b, f("spp/compression"), t("spp.compression"), 0, 2)
    _bn_relu_conv(b, f("spp/shortcut"), t("spp.shortcut"), 0, 2)

    b.bn(f("final_layer/bn1"), t("final_layer.bn1"))
    b.conv(f("final_layer/conv1"), t("final_layer.conv1"))
    b.bn(f("final_layer/bn2"), t("final_layer.bn2"))
    b.conv(f("final_layer/conv2"), t("final_layer.conv2"))


def convert_ddrnet(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """DDRNet-23-slim ImageNet checkpoint -> DualResNetBackbone variables.
    (Ignores the classifier entries absent from our backbone.)"""
    b = _Builder(sd)
    _ddrnet(b, "", "")
    return b.variables()


def _gub(b: _Builder, fpath: str, tpath: str):
    b.conv(f"{fpath}/feature_conv_a/conv", f"{tpath}.feature_conv.0")
    b.bn(f"{fpath}/feature_conv_a/bn", f"{tpath}.feature_conv.1")
    b.conv(f"{fpath}/feature_conv_b/conv", f"{tpath}.feature_conv.3")
    b.bn(f"{fpath}/feature_conv_b/bn", f"{tpath}.feature_conv.4")
    b.conv(f"{fpath}/guide_conv_a/conv", f"{tpath}.guide_conv.0")
    b.bn(f"{fpath}/guide_conv_a/bn", f"{tpath}.guide_conv.1")
    b.conv(f"{fpath}/guide_conv_b/conv", f"{tpath}.guide_conv.3")
    b.bn(f"{fpath}/guide_conv_b/bn", f"{tpath}.guide_conv.4")
    b.conv(f"{fpath}/comb_conv_a/conv", f"{tpath}.comb_conv.0")
    b.bn(f"{fpath}/comb_conv_a/bn", f"{tpath}.comb_conv.1")
    b.conv(f"{fpath}/comb_conv_b/conv", f"{tpath}.comb_conv.3")
    b.bn(f"{fpath}/comb_conv_b/bn", f"{tpath}.comb_conv.4")
    b.dense(f"{fpath}/SE_block/fc1", f"{tpath}.SE_block.fc.0")
    b.dense(f"{fpath}/SE_block/fc2", f"{tpath}.SE_block.fc.2")
    b.conv(f"{fpath}/reduce", f"{tpath}.reduce")


def convert_guidedepth(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Full GuideDepth model state_dict -> tpudepth GuideDepth variables."""
    b = _Builder(sd)
    _ddrnet(b, "feature_extractor", "feature_extractor")
    for i in (1, 2, 3):
        _gub(b, f"up_{i}", f"up_{i}")
    return b.variables()


# ---------------------------------------------------------------------------
# torchvision MobileNetV3
# ---------------------------------------------------------------------------


def convert_mobilenetv3(
    sd: Mapping[str, np.ndarray], arch: str = "large", torch_prefix: str = "features"
) -> Dict[str, Any]:
    """torchvision mobilenet_v3_{large,small} features -> MobileNetV3Features
    variables. ``torch_prefix`` lets callers point at e.g.
    ``Unet.0.original_model.features`` inside reference checkpoints."""
    from tpudepth.models.mobilenetv3 import LARGE_SPEC, SMALL_SPEC

    spec = LARGE_SPEC if arch == "large" else SMALL_SPEC
    b = _Builder(sd)
    t = lambda p: f"{torch_prefix}.{p}" if torch_prefix else p

    def cna(fpath: str, tpath: str):
        b.conv(f"{fpath}/conv", f"{tpath}.0")
        b.bn(f"{fpath}/bn", f"{tpath}.1")

    cna("stem", t("0"))
    for i, (k, exp, out, se, act, s) in enumerate(spec):
        fe = f"block{i + 1}"
        tb = t(f"{i + 1}.block")
        j = 0
        # expand layer exists iff exp != in_channels; in both specs that is
        # every block except the first.
        has_expand = i != 0
        if has_expand:
            cna(f"{fe}/expand", f"{tb}.{j}")
            j += 1
        cna(f"{fe}/depthwise", f"{tb}.{j}")
        j += 1
        if se:
            b.conv(f"{fe}/se/fc1", f"{tb}.{j}.fc1")
            b.conv(f"{fe}/se/fc2", f"{tb}.{j}.fc2")
            j += 1
        cna(f"{fe}/project", f"{tb}.{j}")
    cna("head", t(str(len(spec) + 1)))
    return b.variables()


# ---------------------------------------------------------------------------
# SAM / NewCRF attention models (root stack)
# ---------------------------------------------------------------------------


def _mnv3_encoder(b: _Builder, fprefix: str, tprefix: str, arch: str = "large"):
    from tpudepth.models.mobilenetv3 import LARGE_SPEC, SMALL_SPEC

    spec = LARGE_SPEC if arch == "large" else SMALL_SPEC
    f = lambda p: f"{fprefix}/{p}" if fprefix else p
    t = lambda p: f"{tprefix}.{p}" if tprefix else p

    def cna(fpath, tpath):
        b.conv(f"{fpath}/conv", f"{tpath}.0")
        b.bn(f"{fpath}/bn", f"{tpath}.1")

    cna(f("stem"), t("0"))
    for i, (k, exp, out, se, act, s) in enumerate(spec):
        fe = f(f"block{i + 1}")
        tb = t(f"{i + 1}.block")
        j = 0
        if i != 0:
            cna(f"{fe}/expand", f"{tb}.{j}")
            j += 1
        cna(f"{fe}/depthwise", f"{tb}.{j}")
        j += 1
        if se:
            b.conv(f"{fe}/se/fc1", f"{tb}.{j}.fc1")
            b.conv(f"{fe}/se/fc2", f"{tb}.{j}.fc2")
            j += 1
        cna(f"{fe}/project", f"{tb}.{j}")
    cna(f("head"), t(str(len(spec) + 1)))


def _sam_stage(b: _Builder, fpath: str, tpath: str, has_proj_e: bool, has_proj_q: bool):
    """One SAM module (``src/SAM.py:247-308``). The reference's unused
    ``self.proj`` conv (``:271``) is skipped."""
    t = (lambda p: f"{tpath}.{p}") if tpath else (lambda p: p)
    if has_proj_e:
        b.conv(f"{fpath}/proj_e", t("proj_e"))
    if has_proj_q:
        b.conv(f"{fpath}/proj_q", t("proj_q"))
    blk = f"{fpath}/sam_block"
    tblk = t("sam_block")
    b.layer_norm(f"{blk}/norm1", f"{tblk}.norm1")
    b.layer_norm(f"{blk}/normv", f"{tblk}.normv")
    b.raw(f"{blk}/attn/relative_position_bias_table",
          f"{tblk}.attn.relative_position_bias_table")
    b.used.add(f"{tblk}.attn.relative_position_index")  # buffer, rebuilt
    b.dense(f"{blk}/attn/q", f"{tblk}.attn.q")
    b.dense(f"{blk}/attn/kv", f"{tblk}.attn.kv")
    b.dense(f"{blk}/attn/proj", f"{tblk}.attn.proj")
    b.layer_norm(f"{blk}/norm2", f"{tblk}.norm2")
    b.dense(f"{blk}/mlp/fc1", f"{tblk}.mlp.fc1")
    b.dense(f"{blk}/mlp/fc2", f"{tblk}.mlp.fc2")
    b.layer_norm(f"{fpath}/norm_sam", t("norm_sam"))


def _newcrf_stage(b: _Builder, fpath: str, tpath: str, has_proj_x: bool,
                  has_proj_v: bool, depth: int = 2):
    """One NewCRF module (``src/newcrf_layers.py:367-433``)."""
    t = (lambda p: f"{tpath}.{p}") if tpath else (lambda p: p)
    if has_proj_x:
        b.conv(f"{fpath}/proj_x", t("proj_x"))
    if has_proj_v:
        b.conv(f"{fpath}/proj_v", t("proj_v"))
    for i in range(depth):
        blk = f"{fpath}/block{i}"
        tblk = t(f"crf_layer.blocks.{i}")
        b.layer_norm(f"{blk}/norm1", f"{tblk}.norm1")
        b.raw(f"{blk}/attn/relative_position_bias_table",
              f"{tblk}.attn.relative_position_bias_table")
        b.used.add(f"{tblk}.attn.relative_position_index")
        b.dense(f"{blk}/attn/qk", f"{tblk}.attn.qk")
        b.dense(f"{blk}/attn/proj", f"{tblk}.attn.proj")
        b.layer_norm(f"{blk}/norm2", f"{tblk}.norm2")
        b.dense(f"{blk}/mlp/fc1", f"{tblk}.mlp.fc1")
        b.dense(f"{blk}/mlp/fc2", f"{tblk}.mlp.fc2")
    b.layer_norm(f"{fpath}/norm_crf", t("norm_crf"))


def convert_attention_model(
    sd: Mapping[str, np.ndarray], variant: str = "sam"
) -> Dict[str, Any]:
    """Full SAM / NewCRF PTModel state_dict -> tpudepth variables.

    Reference layout: ``Unet.0`` = Encoder (``original_model.features``),
    ``Unet.1`` = Decoder {conv0, crf3..crf0, conv1}
    (``src/model_mobileV3_large_SAM.py:184-193``). All four stages project
    both inputs (input_dim != embed_dim != v_dim everywhere).
    """
    b = _Builder(sd)
    _mnv3_encoder(b, "encoder", "Unet.0.original_model.features", "large")
    b.conv("decoder/conv0", "Unet.1.conv0")
    for i in range(4):
        if variant == "sam":
            _sam_stage(b, f"decoder/crf{i}", f"Unet.1.crf{i}", True, True)
            # drop the unused 3x3 self.proj conv (src/SAM.py:271)
            b.used.add(f"Unet.1.crf{i}.proj.weight")
            b.used.add(f"Unet.1.crf{i}.proj.bias")
        else:
            _newcrf_stage(b, f"decoder/crf{i}", f"Unet.1.crf{i}", True, True)
    b.conv("decoder/conv1", "Unet.1.conv1")
    return b.variables()
