"""Model registry: meta-architectures and backbone builders.

Mirrors the registry-driven dispatch of the reference
(`META_ARCH_REGISTRY` in tridet/modeling/dd3d/core.py:18,
`BACKBONE_REGISTRY` in tridet/modeling/feature_extractor/dla.py:445-561),
without detectron2: plain dicts of builder callables keyed by the same
config strings (`MODEL.META_ARCHITECTURE`, `FE.BUILDER`).
"""

META_ARCH_REGISTRY = {}
BACKBONE_REGISTRY = {}


def register_meta_arch(name):
    def deco(fn):
        META_ARCH_REGISTRY[name] = fn
        return fn

    return deco


def register_backbone(name):
    def deco(fn):
        BACKBONE_REGISTRY[name] = fn
        return fn

    return deco


def build_feature_extractor(cfg):
    """Resolve `cfg.FE.BUILDER`, cf. tridet/modeling/feature_extractor/__init__.py:13-26."""
    import dd3d_tpu.models.dla  # noqa: F401  (populates registry)
    import dd3d_tpu.models.regnet  # noqa: F401
    import dd3d_tpu.models.vovnet  # noqa: F401

    builder = BACKBONE_REGISTRY.get(cfg.FE.BUILDER)
    if builder is None:
        raise KeyError(f"Unknown FE.BUILDER {cfg.FE.BUILDER!r}; known: {sorted(BACKBONE_REGISTRY)}")
    return builder(cfg)


def build_model(cfg):
    """Resolve `cfg.MODEL.META_ARCHITECTURE` to a flax module."""
    from dd3d_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # before the first jit of this model's graphs
    import dd3d_tpu.models.dd3d  # noqa: F401
    import dd3d_tpu.models.dense_depth  # noqa: F401
    import dd3d_tpu.models.nuscenes_dd3d  # noqa: F401

    builder = META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)
    if builder is None:
        raise KeyError(
            f"Unknown MODEL.META_ARCHITECTURE {cfg.MODEL.META_ARCHITECTURE!r}; known: {sorted(META_ARCH_REGISTRY)}"
        )
    return builder(cfg)
