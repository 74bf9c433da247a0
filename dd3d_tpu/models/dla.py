"""Deep Layer Aggregation backbone (DLA) in flax/NHWC.

TPU-native rebuild of `tridet/modeling/feature_extractor/dla.py` (itself from
ucbdrive/dla): recursive Tree aggregation with Root nodes, 6 levels with
strides 1..32. Topology parity notes:
- block types BasicBlock / Bottleneck / BottleneckX (dla.py:24-143)
- Tree/Root recursion incl. root_dim bookkeeping and the project-conv rule
  "only when tree1 is a leaf block" (dla.py:146-247)
- named variants table (dla.py:430-441)

All convs run in bf16 on the MXU with fp32 params; the channel counts
(16..512) are MXU-friendly multiples.
"""
from functools import partial
from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models import register_backbone
from dd3d_tpu.models.layers import ConvNorm
from dd3d_tpu.models.fpn import FPN


def relu(x):
    return nn.relu(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (dla.py:24-61)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvNorm(self.planes, 3, self.stride, dilation=self.dilation, norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        out = relu(out)
        out = ConvNorm(self.planes, 3, 1, dilation=self.dilation, norm=self.norm, dtype=self.dtype, name="conv2")(out, train)
        out = out + residual
        return relu(out)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (dla.py:64-100). expansion=2."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm: str = "BN"
    expansion: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.planes // self.expansion
        out = ConvNorm(bottle, 1, 1, norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        out = relu(out)
        out = ConvNorm(bottle, 3, self.stride, dilation=self.dilation, norm=self.norm, dtype=self.dtype, name="conv2")(out, train)
        out = relu(out)
        out = ConvNorm(self.planes, 1, 1, norm=self.norm, dtype=self.dtype, name="conv3")(out, train)
        out = out + residual
        return relu(out)


class BottleneckX(nn.Module):
    """Grouped (ResNeXt-style) bottleneck, cardinality 32 (dla.py:103-143)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm: str = "BN"
    cardinality: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.planes * self.cardinality // 32
        out = ConvNorm(bottle, 1, 1, norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        out = relu(out)
        out = ConvNorm(
            bottle, 3, self.stride, dilation=self.dilation, groups=self.cardinality, norm=self.norm, dtype=self.dtype, name="conv2"
        )(out, train)
        out = relu(out)
        out = ConvNorm(self.planes, 1, 1, norm=self.norm, dtype=self.dtype, name="conv3")(out, train)
        out = out + residual
        return relu(out)


class Root(nn.Module):
    """Aggregation node: 1x1 conv over concatenated children (dla.py:146-166)."""

    out_channels: int
    kernel_size: int = 1
    residual: bool = False
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, *children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvNorm(self.out_channels, self.kernel_size, 1, norm=self.norm, dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return relu(x)


class Tree(nn.Module):
    """Recursive DLA tree (dla.py:169-247)."""

    levels: int
    block: Type[nn.Module]
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    dilation: int = 1
    root_residual: bool = False
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim if self.root_dim != 0 else 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)
        bottom = nn.max_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride)) if self.stride > 1 else x

        if self.levels == 1:
            # project only exists when tree1 is a leaf block (dla.py:238-243)
            if self.in_channels != self.out_channels:
                residual = ConvNorm(self.out_channels, 1, 1, norm=self.norm, dtype=self.dtype, name="project")(bottom, train)
            else:
                residual = bottom
        else:
            residual = bottom

        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = self.block(self.out_channels, self.stride, self.dilation, self.norm, dtype=self.dtype, name="tree1")(
                x, residual, train=train
            )
            x2 = self.block(self.out_channels, 1, self.dilation, self.norm, dtype=self.dtype, name="tree2")(x1, train=train)
            out = Root(self.out_channels, self.root_kernel_size, self.root_residual, self.norm, dtype=self.dtype, name="root")(
                x2, x1, *children, train=train
            )
        else:
            x1 = Tree(
                self.levels - 1,
                self.block,
                self.in_channels,
                self.out_channels,
                self.stride,
                root_kernel_size=self.root_kernel_size,
                dilation=self.dilation,
                root_residual=self.root_residual,
                norm=self.norm,
                dtype=self.dtype,
                name="tree1",
            )(x, train=train)
            children.append(x1)
            out = Tree(
                self.levels - 1,
                self.block,
                self.out_channels,
                self.out_channels,
                root_dim=root_dim + self.out_channels,
                root_kernel_size=self.root_kernel_size,
                dilation=self.dilation,
                root_residual=self.root_residual,
                norm=self.norm,
                dtype=self.dtype,
                name="tree2",
            )(x1, children=children, train=train)
        return out


class DLA(nn.Module):
    """DLA trunk; emits a dict of `level{i}` features (strides 2**i).

    cf. tridet/modeling/feature_extractor/dla.py:250-355. size_divisibility
    of the trunk is 32 (dla.py:317-319).
    """

    levels: Sequence[int]
    channels: Sequence[int]
    block: Type[nn.Module] = BasicBlock
    residual_root: bool = False
    out_features: Sequence[str] = ("level3", "level4", "level5")
    norm: str = "BN"
    # False: plain stem; True: s2d stem everywhere; "train": s2d stem for
    # the training graph only (its weight-gradient layout wins there:
    # 161.0 vs 154.5 imgs/s at batch 40 on v5e — the [7,7,3,16] stem dW is
    # the single worst op of the plain train step; the plain stem stays for
    # inference where s2d's phase-mixed kernels measured slower). The two
    # stems share a byte-identical parameter tree (tests/test_s2d_stem.py).
    s2d_stem: Any = False
    # Batch-fold the s2d stem onto one guard-banded row canvas (see
    # _stem_s2d / models/s2d.py). Only meaningful when the s2d stem is
    # active; ignored at batch 1.
    s2d_fold: bool = False
    # Run the 7x7 base layer at s2d factor 4 ([3,3,48,256] kernel — full
    # MXU lanes for the forward AND the weight gradient) then repack to
    # the s2d(2) domain for level0/level1. Exact; s2d-stem only.
    s2d_base4: bool = False
    # Use the Pallas slab kernel for the s2d stem's stride-1 weight
    # gradients (ops/pallas_conv.py; attacks the diagnosed [5,5,12,64]
    # batch-minor dW, ROADMAP round-4). s2d-stem "s1" convs only.
    pallas_stem_dw: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = {}
        ch = self.channels
        use_s2d = self.s2d_stem is True or (self.s2d_stem == "train" and train)
        if use_s2d:
            x = self._stem_s2d(x, outputs, train)
        else:
            x = self._stem_plain(x, outputs, train)

        tree_args = dict(
            block=self.block, root_residual=self.residual_root, norm=self.norm, dtype=self.dtype
        )
        x = self._trees(x, outputs, tree_args, train)
        return outputs

    def _stem_plain(self, x, outputs, train):
        ch = self.channels
        x = ConvNorm(ch[0], 7, 1, norm=self.norm, dtype=self.dtype, name="base_layer")(x, train)
        x = relu(x)

        # level0/level1: plain conv stacks.
        for i, (n_convs, stride) in enumerate([(self.levels[0], 1), (self.levels[1], 2)]):
            for j in range(n_convs):
                x = ConvNorm(
                    ch[i], 3, stride if j == 0 else 1, norm=self.norm, dtype=self.dtype, name=f"level{i}_conv{j}"
                )(x, train)
                x = relu(x)
            if f"level{i}" in self.out_features:
                outputs[f"level{i}"] = x
        return x

    def _stem_s2d(self, x, outputs, train):
        """Numerically equivalent stem over a 2x2 space-to-depth layout; the
        param tree matches `_stem_plain` exactly (see models/s2d.py).

        With `s2d_fold` the whole s2d stem additionally runs on ONE
        guard-banded (1, B*(H+G), W, C) canvas (s2d.py fold_batch_rows):
        XLA's batch-minor weight-gradient layouts (B=40 padded to 128
        lanes, the [5,5,12,64] stem dW at ~2% MFU) disappear because the
        batch dim is gone. Exactness notes in models/s2d.py."""
        from dd3d_tpu.models.s2d import (
            S2DConvNorm, depth_to_space, space_to_depth, s2d4_to_s2d2,
            fold_batch_rows, fold_row_mask, unfold_batch_rows,
        )

        ch = self.channels
        base4 = bool(self.s2d_base4) and not self.s2d_fold
        if base4:
            # 7x7 base at s2d(4): [3,3,48,256] kernel, then repack to the
            # s2d(2) domain for level0/level1.
            x = space_to_depth(x, 4)
            x = S2DConvNorm(ch[0], 7, mode="s1", factor=4, norm=self.norm,
                            dtype=self.dtype, name="base_layer")(x, train)
            x = relu(x)
            x = s2d4_to_s2d2(x)
        else:
            x = space_to_depth(x, 2)
        b, hs = x.shape[0], x.shape[1]
        # G >= max conv pad in the s2d domain (base 7x7 -> K=5, P=2).
        guard = 4
        fold = bool(self.s2d_fold) and b > 1
        mask = None
        vf = 1.0
        if fold:
            x = fold_batch_rows(x, guard)
            mask = fold_row_mask(b, hs, guard)
            vf = hs / (hs + guard)

        def _relu_mask(x):
            x = relu(x)
            # guard rows are BN-bias constants after norm+relu; the next
            # conv reads them as zero padding, so re-zero (fuses into the
            # relu elementwise pass).
            return x * mask.astype(x.dtype) if fold else x

        if not base4:
            x = S2DConvNorm(ch[0], 7, mode="s1", norm=self.norm, dtype=self.dtype,
                            valid_frac=vf, pallas_dw=self.pallas_stem_dw,
                            name="base_layer")(x, train, row_mask=mask)
            x = _relu_mask(x)
        for j in range(self.levels[0]):
            x = S2DConvNorm(ch[0], 3, mode="s1", norm=self.norm, dtype=self.dtype,
                            valid_frac=vf, pallas_dw=self.pallas_stem_dw,
                            name=f"level0_conv{j}")(x, train, row_mask=mask)
            x = _relu_mask(x)
        if "level0" in self.out_features:
            x0 = unfold_batch_rows(x, b, guard) if fold else x
            outputs["level0"] = depth_to_space(x0, 2)
        # first level1 conv is stride 2 in the original graph: it consumes the
        # s2d layout and produces the plain half-resolution layout.
        x = S2DConvNorm(ch[1], 3, mode="exit2", norm=self.norm, dtype=self.dtype,
                        valid_frac=vf, name="level1_conv0")(x, train, row_mask=mask)
        x = relu(x)
        if fold:
            x = unfold_batch_rows(x, b, guard)
        for j in range(1, self.levels[1]):
            x = ConvNorm(ch[1], 3, 1, norm=self.norm, dtype=self.dtype, name=f"level1_conv{j}")(x, train)
            x = relu(x)
        if "level1" in self.out_features:
            outputs["level1"] = x
        return x

    def _trees(self, x, outputs, tree_args, train):
        ch = self.channels
        x = Tree(self.levels[2], in_channels=ch[1], out_channels=ch[2], stride=2, level_root=False, name="level2", **tree_args)(
            x, train=train
        )
        if "level2" in self.out_features:
            outputs["level2"] = x
        for lvl in (3, 4, 5):
            x = Tree(
                self.levels[lvl], in_channels=ch[lvl - 1], out_channels=ch[lvl], stride=2, level_root=True,
                name=f"level{lvl}", **tree_args
            )(x, train=train)
            if f"level{lvl}" in self.out_features:
                outputs[f"level{lvl}"] = x
        return x


# name -> (levels, channels, block, residual_root); cf. dla.py:360-427,430-441
DLA_VARIANTS = {
    "DLA-34": ([1, 1, 1, 2, 2, 1], [16, 32, 64, 128, 256, 512], BasicBlock, False),
    "DLA-46-C": ([1, 1, 1, 2, 2, 1], [16, 32, 64, 64, 128, 256], Bottleneck, False),
    "DLA-X-46-C": ([1, 1, 1, 2, 2, 1], [16, 32, 64, 64, 128, 256], BottleneckX, False),
    "DLA-X-60-C": ([1, 1, 1, 2, 3, 1], [16, 32, 64, 64, 128, 256], BottleneckX, False),
    "DLA-60": ([1, 1, 1, 2, 3, 1], [16, 32, 128, 256, 512, 1024], Bottleneck, False),
    "DLA-X-60": ([1, 1, 1, 2, 3, 1], [16, 32, 128, 256, 512, 1024], BottleneckX, False),
    "DLA-102": ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], Bottleneck, True),
    "DLA-X-102": ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], BottleneckX, True),
    "DLA-X-102-64": ([1, 1, 1, 3, 4, 1], [16, 32, 128, 256, 512, 1024], partial(BottleneckX, cardinality=64), True),
    "DLA-169": ([1, 1, 2, 3, 5, 1], [16, 32, 128, 256, 512, 1024], Bottleneck, True),
}

DLA_STRIDES = {f"level{i}": 2 ** i for i in range(6)}


def _coerce_s2d(v):
    """TPU.S2D_STEM: False | True | "train" (CLI strings accepted); any
    other string raises — a typo must not silently disable the stem."""
    if isinstance(v, str):
        s = v.strip().lower()
        if s == "train":
            return "train"
        if s in ("true", "1", "yes"):
            return True
        if s in ("false", "0", "no", ""):
            return False
        raise ValueError(f"TPU.S2D_STEM must be True/False/'train', got {v!r}")
    return bool(v)


def _dla_trunk(cfg, dtype):
    name = cfg.FE.BACKBONE.NAME
    levels, channels, block, residual_root = DLA_VARIANTS[name]
    s2d = _coerce_s2d(cfg.TPU.get("S2D_STEM", False))
    if s2d == "train":
        import jax

        if jax.default_backend() == "cpu":
            # The s2d train stem's dense phase-mixed kernels are
            # pathologically slow on the CPU backend (tens of seconds per
            # step — it blew the 30 s Gloo rendezvous in the 2-process
            # test). "train" means "s2d in the training graph ON TPU";
            # CPU runs (tests, dryruns) get the plain stem. An explicit
            # S2D_STEM=True still packs everywhere, on any backend.
            s2d = False
    trunk = DLA(
        levels=levels,
        channels=channels,
        block=block,
        residual_root=residual_root,
        out_features=tuple(cfg.FE.BACKBONE.OUT_FEATURES),
        norm=cfg.FE.BACKBONE.NORM,
        s2d_stem=s2d,
        s2d_fold=bool(cfg.TPU.get("S2D_STEM_FOLD", False)),
        s2d_base4=bool(cfg.TPU.get("S2D_BASE4", False)),
        pallas_stem_dw=bool(cfg.TPU.get("PALLAS_STEM_DW", False)),
        dtype=dtype,
    )
    out_channels = {f"level{i}": channels[i] for i in range(6)}
    return trunk, out_channels, DLA_STRIDES


@register_backbone("build_fcos_dla_fpn_backbone_p67")
def build_fcos_dla_fpn_backbone_p67(cfg):
    """DLA + FPN + P6P7 top block (strides 8..128); the KITTI backbone.

    cf. tridet/modeling/feature_extractor/dla.py:536-561; size_div 32*4=128.
    """
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    trunk, trunk_channels, trunk_strides = _dla_trunk(cfg, dtype)
    fpn = FPN(
        bottom_up=trunk,
        in_features=tuple(cfg.FE.FPN.IN_FEATURES),
        in_channels={f: trunk_channels[f] for f in cfg.FE.FPN.IN_FEATURES},
        in_strides={f: trunk_strides[f] for f in cfg.FE.FPN.IN_FEATURES},
        out_channels=cfg.FE.FPN.OUT_CHANNELS,
        norm=cfg.FE.FPN.NORM,
        fuse_type=cfg.FE.FPN.FUSE_TYPE,
        top_block="p6p7",
        dtype=dtype,
    )
    return fpn


@register_backbone("build_fcos_dla_fpn_backbone_p6")
def build_fcos_dla_fpn_backbone_p6(cfg):
    """DLA + FPN + P6 top block (strides 8..64). cf. dla.py:508-533."""
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    trunk, trunk_channels, trunk_strides = _dla_trunk(cfg, dtype)
    return FPN(
        bottom_up=trunk,
        in_features=tuple(cfg.FE.FPN.IN_FEATURES),
        in_channels={f: trunk_channels[f] for f in cfg.FE.FPN.IN_FEATURES},
        in_strides={f: trunk_strides[f] for f in cfg.FE.FPN.IN_FEATURES},
        out_channels=cfg.FE.FPN.OUT_CHANNELS,
        norm=cfg.FE.FPN.NORM,
        fuse_type=cfg.FE.FPN.FUSE_TYPE,
        top_block="p6",
        dtype=dtype,
    )


@register_backbone("build_dla_fpn_backbone")
def build_dla_fpn_backbone(cfg):
    """DLA + FPN + max-pool top level. cf. dla.py:462-483."""
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    trunk, trunk_channels, trunk_strides = _dla_trunk(cfg, dtype)
    return FPN(
        bottom_up=trunk,
        in_features=tuple(cfg.FE.FPN.IN_FEATURES),
        in_channels={f: trunk_channels[f] for f in cfg.FE.FPN.IN_FEATURES},
        in_strides={f: trunk_strides[f] for f in cfg.FE.FPN.IN_FEATURES},
        out_channels=cfg.FE.FPN.OUT_CHANNELS,
        norm=cfg.FE.FPN.NORM,
        fuse_type=cfg.FE.FPN.FUSE_TYPE,
        top_block="maxpool",
        dtype=dtype,
    )
