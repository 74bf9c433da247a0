"""PyTorch (reference) checkpoint -> flax params converter.

The reference ships DDAD15M depth-pretrained `.pth` state dicts
(README.md:120-125) with detectron2-style module names. This converts them
into our flax param/batch_stats trees:
- conv weights (O, I, kH, kW) -> (kH, kW, I, O),
- BatchNorm weight/bias -> params scale/bias; running stats -> batch_stats,
- FrozenBN: everything -> batch_stats,
- name translation per the mapping table below (reference name patterns from
  tridet/modeling/feature_extractor/dla.py, fcos2d.py, fcos3d.py and d2 FPN).

Usage:
    import torch
    sd = torch.load(path, map_location="cpu")["model"]  # or raw state dict
    params, batch_stats = convert_torch_state_dict(sd, variables)
"""
import logging
import re
from typing import Dict, Tuple

import numpy as np

LOG = logging.getLogger(__name__)


def _normalize_vovnet(k: str) -> str:
    """Canonicalize VoVNet's OrderedDict slash-names (vovnet.py:100-161) into
    dotted module paths matching our flax tree."""
    k = re.sub(r"\.stage\d+\.(OSA)", r".\1", k)  # drop the _OSA_stage level
    k = re.sub(r"\.stem\.stem_(\d)/", r".stem\1.", k)
    k = re.sub(r"\.layers\.(\d+)\.[^./]+/dw_conv3x3\.", r".layer\1.dw.", k)
    k = re.sub(r"\.layers\.(\d+)\.[^./]+/pw_conv1x1\.", r".layer\1.pw.conv.", k)
    k = re.sub(r"\.layers\.(\d+)\.[^./]+/pw_norm\.", r".layer\1.pw.norm.", k)
    k = re.sub(r"\.layers\.(\d+)\.[^./]+/(conv|norm)\.", r".layer\1.\2.", k)
    k = re.sub(r"\.concat\.[^./]+/(conv|norm)\.", r".concat.\1.", k)
    k = re.sub(r"\.conv_reduction\.[^./]+/(conv|norm)\.", r".conv_reduction.\1.", k)
    return k


def _translate_name(key: str):
    """Reference param name -> (our dotted module path, leaf kind).

    leaf kind: 'kernel' | 'bias' | 'bn_scale' | 'bn_bias' | 'bn_mean' |
    'bn_var' | 'scalar_scale' | 'scalar_bias' | None (skip).
    """
    k = _normalize_vovnet(key)
    if k.endswith("num_batches_tracked") or k.startswith(("pixel_mean", "pixel_std")):
        return None, None

    # --- norm leaves (shared suffix handling) ---
    m = re.match(r"^(.*)\.norm(\.\d+)?\.(weight|bias|running_mean|running_var)$", k)
    norm_leaf = None
    if m:
        base, lvl, leaf = m.group(1), m.group(2), m.group(3)
        norm_leaf = {"weight": "bn_scale", "bias": "bn_bias", "running_mean": "bn_mean", "running_var": "bn_var"}[leaf]
        lvl_idx = int(lvl[1:]) if lvl else None
        path = _translate_module(base, norm=True, norm_level=lvl_idx)
        return path, norm_leaf

    m = re.match(r"^(.*)\.(weight|bias)$", k)
    if m:
        base, leaf = m.group(1), m.group(2)
        # learnable Scale/Offset scalars
        sm = re.match(r"^(.*)\.scales?_([a-z0-9_]+)\.(\d+)\.scale$", k)
        if sm:
            head, name, idx = sm.group(1), sm.group(2), sm.group(3)
            if name == "reg":  # FCOS2D _VERSION=v1 names (fcos2d.py:101-103)
                name = "box2d_reg"
            return f"{head}.scale_{name}{idx}", "scalar_scale"
        om = re.match(r"^(.*)\.offsets_([a-z0-9_]+)\.(\d+)\.bias$", k)
        if om:
            head, name, idx = om.group(1), om.group(2), om.group(3)
            return f"{head}.offset_{name}{idx}", "scalar_bias"
        path = _translate_module(base, norm=False)
        return path, ("kernel" if leaf == "weight" else "bias")

    m = re.match(r"^(.*)\.scales?_([a-z0-9_]+)\.(\d+)\.scale$", k)
    if m:
        return f"{m.group(1)}.scale_{m.group(2)}{m.group(3)}", "scalar_scale"
    return None, None


def _translate_module(base: str, norm: bool, norm_level=None) -> str:
    """Translate a reference module path to our flax module path."""
    p = base

    # DLA conv-level stages: level0.0 -> level0_conv0
    p = re.sub(r"\blevel([01])\.(\d+)$", r"level\1_conv\2", p)
    # FPN: fpn_lateral3 -> fpn_lateral_level3 (DLA) handled by caller context;
    # we keep a generic marker resolved in convert via candidates.
    p = re.sub(r"\bfpn_lateral(\d)$", r"fpn_lateral_#\1", p)
    p = re.sub(r"\bfpn_output(\d)$", r"fpn_output_#\1", p)
    p = re.sub(r"\btop_block\.p6$", "top_p6", p)
    p = re.sub(r"\btop_block\.p7$", "top_p7", p)

    # FCOS towers: cls_tower.0 -> cls_tower_conv0 (+ norm -> cls_tower_norm0.norm{lvl})
    tower = re.match(r"^(.*)\.(cls_tower|box2d_tower|box3d_tower)\.(\d+)$", p)
    if tower:
        head, name, idx = tower.group(1), tower.group(2), tower.group(3)
        if norm and norm_level is not None:
            return f"{head}.{name}_norm{idx}.norm{norm_level}"
        if norm:
            return f"{head}.{name}_norm{idx}.norm"
        return f"{head}.{name}_conv{idx}"

    # FCOS3D predictors: box3d_quat.0 -> box3d_quat0
    p = re.sub(r"\b(box3d_quat|box3d_ctr|box3d_depth|box3d_size|box3d_conf|dense_depth)\.(\d+)$", r"\1\2", p)

    if norm:
        if norm_level is not None:
            return f"{p}.norm{norm_level}"
        # plain Conv2d with a norm submodule -> our ConvNorm {conv, norm}
        return f"{p}.norm"
    # plain conv weight: does this module use ConvNorm (conv submodule) or a
    # bare nn.Conv? Resolved at assignment time by trying both.
    return p


def _candidates(path: str, leaf: str):
    """Yield candidate (tree_keys, leaf_name, collection) for a translated path."""
    parts = path.split(".")
    if leaf == "kernel":
        yield parts + ["conv"], "kernel", "params"  # ConvNorm
        yield parts, "kernel", "params"  # bare nn.Conv
    elif leaf == "bias":
        yield parts + ["conv"], "bias", "params"
        yield parts, "bias", "params"
    elif leaf == "bn_scale":
        yield parts, "scale", "params"  # nn.BatchNorm
        yield parts, "scale", "batch_stats"  # FrozenBN
    elif leaf == "bn_bias":
        yield parts, "bias", "params"
        yield parts, "bias", "batch_stats"
    elif leaf == "bn_mean":
        yield parts, "mean", "batch_stats"
    elif leaf == "bn_var":
        yield parts, "var", "batch_stats"
    elif leaf == "scalar_scale":
        yield parts, "scale", "params"
    elif leaf == "scalar_bias":
        yield parts, "bias", "params"


def _get_node(tree, keys):
    node = tree
    for k in keys:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray], variables: Dict, strict: bool = False
) -> Tuple[Dict, Dict]:
    """Convert a reference state dict into (params, batch_stats) trees shaped
    like `variables['params']` / `variables['batch_stats']`."""
    import copy

    params = copy.deepcopy(_to_mutable(variables["params"]))
    batch_stats = copy.deepcopy(_to_mutable(variables.get("batch_stats", {})))
    trees = {"params": params, "batch_stats": batch_stats}

    # FPN laterals reference trunk stages by stride digit; build digit->feature
    # name map from the actual tree (fpn_lateral_#3 -> fpn_lateral_level3 or
    # fpn_lateral_stage3).
    backbone = params.get("backbone") or params.get("base", {}).get("backbone", {})
    digit_map = {}
    for key in backbone:
        m = re.match(r"fpn_(lateral|output)_([a-z]+)(\d)$", key)
        if m:
            digit_map[m.group(3)] = m.group(2)

    matched, missed = [], []
    bn_mean_mismatch = []
    for key, value in state_dict.items():
        path, leaf = _translate_name(key)
        if path is None:
            continue
        path = re.sub(r"fpn_(lateral|output)_#(\d)", lambda m: f"fpn_{m.group(1)}_{digit_map.get(m.group(2), 'level' + m.group(2))}{m.group(2)}", path)
        value = np.asarray(value)
        if leaf == "kernel" and value.ndim == 4:
            value = value.transpose(2, 3, 1, 0)
        placed = False
        # NuscenesDD3D nests the DD3D module under "base" (attr/speed heads
        # live at the root); try both rootings.
        candidate_list = []
        for keys, leaf_name, coll in _candidates(path, leaf):
            candidate_list.append((keys, leaf_name, coll))
            if "base" in trees["params"] and keys[0] != "base":
                candidate_list.append((["base"] + keys, leaf_name, coll))
        for keys, leaf_name, coll in candidate_list:
            node = _get_node(trees[coll], keys)
            if node is not None and leaf_name in node:
                target = node[leaf_name]
                if tuple(np.shape(target)) != tuple(value.shape):
                    # grouped conv kernels etc. — flag, don't silently assign
                    bn_mean_mismatch.append((key, tuple(np.shape(target)), tuple(value.shape)))
                    break
                node[leaf_name] = value.astype(np.asarray(target).dtype if hasattr(target, "dtype") else np.float32)
                placed = True
                break
        if not placed and re.search(r"\b(scale|offset)_[a-z0-9_]*\d+$", path):
            # The reference sizes scales_depth/offsets_depth by the number of
            # dataset depth-stat entries, not FPN levels (fcos3d.py:136-139):
            # the nuScenes V99 checkpoint carries a 5th depth Scale/Offset its
            # own forward never indexes. Unused trailing entries are skipped.
            LOG.info("Skipping unused per-level scale/offset %s", key)
            continue
        (matched if placed else missed).append(key)

    if missed:
        LOG.warning("Unconverted reference keys (%d): %s%s", len(missed), missed[:10], "..." if len(missed) > 10 else "")
    if bn_mean_mismatch:
        LOG.warning("Shape mismatches: %s", bn_mean_mismatch[:10])
    if strict and (missed or bn_mean_mismatch):
        raise ValueError(f"Strict conversion failed: {len(missed)} unmatched, {len(bn_mean_mismatch)} mismatched")
    LOG.info("Converted %d/%d reference parameters", len(matched), len(matched) + len(missed))
    return params, batch_stats


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return dict(tree) if isinstance(tree, dict) else tree
