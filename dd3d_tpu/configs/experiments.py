"""Experiment deltas over defaults, mirroring `configs/experiments/*.yaml`.

Each experiment is a dict merged into the default tree, exactly like the
reference's `@package _global_` Hydra deltas
(e.g. `configs/experiments/dd3d_kitti_dla34.yaml`).
"""
from dd3d_tpu.utils.config import CfgNode
from dd3d_tpu.configs.defaults import get_cfg

# tridet configs/experiments/dd3d_kitti_dla34.yaml
DD3D_KITTI_DLA34 = {
    "FE": {
        "BACKBONE": {"NORM": "FrozenBN"},
        "FPN": {"NORM": "FrozenBN"},
    },
    "DD3D": {
        "FCOS2D": {"NORM": "BN", "INFERENCE": {"NMS_THRESH": 0.75}},
        "FCOS3D": {"NORM": "FrozenBN"},
    },
    "INPUT": {
        "RESIZE": {
            "MIN_SIZE_TRAIN": [288, 304, 320, 336, 352, 368, 384, 400, 416, 448, 480, 512, 544, 576],
            "MAX_SIZE_TRAIN": 10000,
            "MIN_SIZE_TEST": 384,
            "MAX_SIZE_TEST": 100000,
        }
    },
    "SOLVER": {
        "IMS_PER_BATCH": 64,
        "BASE_LR": 0.002,
        "MAX_ITER": 25000,
        "STEPS": [21500, 24000],
        "WARMUP_ITERS": 2000,
        "MIXED_PRECISION_ENABLED": True,
        "CHECKPOINT_PERIOD": 2000,
    },
    "TEST": {
        "IMS_PER_BATCH": 80,
        "EVAL_PERIOD": 2000,
        # final-test TTA, like configs/experiments/dd3d_kitti_dla34.yaml:52-57
        "AUG": {"ENABLED": True, "MIN_SIZES": [320, 384, 448, 512, 576], "MAX_SIZE": 100000, "FLIP": True},
    },
    "DATALOADER": {"TRAIN": {"SAMPLER": "RepeatFactorTrainingSampler", "REPEAT_THRESHOLD": 0.4}},
}

# tridet configs/experiments/dd3d_kitti_dla34_overfit.yaml: 32-image overfit
# smoke experiment (README.md:147-155).
DD3D_KITTI_DLA34_OVERFIT = {
    **DD3D_KITTI_DLA34,
    "DATASETS": {"TRAIN": {"NAME": "kitti_3d_overfit", "NUM_CLASSES": 5}, "TEST": {"NAME": "kitti_3d_overfit"}},
    "SOLVER": {
        **DD3D_KITTI_DLA34["SOLVER"],
        "IMS_PER_BATCH": 8,
        "MAX_ITER": 1500,
        "STEPS": [1300, 1450],
        "WARMUP_ITERS": 100,
        "CHECKPOINT_PERIOD": 10000,
    },
}

# tridet configs/experiments/dd3d_kitti_v99.yaml
DD3D_KITTI_V99 = {
    "FE": {
        "BUILDER": "build_fcos_vovnet_fpn_backbone_p6",
        "BACKBONE": {"NAME": "V-99-eSE", "NORM": "FrozenBN", "OUT_FEATURES": ["stage3", "stage4", "stage5"]},
        "FPN": {"NORM": "FrozenBN", "IN_FEATURES": ["stage3", "stage4", "stage5"]},
        "OUT_FEATURES": ["p3", "p4", "p5", "p6"],
    },
    "DD3D": {
        "FCOS2D": {"NORM": "BN", "INFERENCE": {"NMS_THRESH": 0.75}},
        "FCOS3D": {"NORM": "FrozenBN"},
    },
    "SOLVER": {
        "IMS_PER_BATCH": 64,
        "BASE_LR": 0.002,
        "MAX_ITER": 25000,
        "STEPS": [21500, 24000],
        "WARMUP_ITERS": 2000,
        "MIXED_PRECISION_ENABLED": True,
    },
}

# tridet configs/experiments/dd3d_nusc_dla34.yaml
DD3D_NUSC_DLA34 = {
    "MODEL": {"META_ARCHITECTURE": "NuscenesDD3D"},
    "DATASETS": {
        "TRAIN": {"NAME": "nusc_train", "NUM_CLASSES": 10},
        "TEST": {"NAME": "nusc_val-subsample-8"},
    },
    "DD3D": {
        "NUM_CLASSES": 10,
        "FCOS2D": {"NORM": "BN"},
        "FCOS3D": {
            "NORM": "FrozenBN",
            "MEAN_DEPTH_PER_LEVEL": [44.921, 20.252, 11.712, 7.166, 8.548],
            "STD_DEPTH_PER_LEVEL": [24.331, 9.833, 6.223, 4.611, 8.275],
            "CANONICAL_BOX3D_SIZES": [
                [2.3524184, 0.5062202, 1.0413622],   # barrier
                [0.61416006, 1.7016163, 1.3054738],  # bicycle
                [2.9139252, 10.725025, 3.2832346],   # bus
                [1.9449884, 4.617021, 1.7115173],    # car
                [2.8765516, 6.8920305, 3.2312427],   # construction vehicle
                [0.7800532, 2.138673, 1.4878378],    # motorcycle
                [0.6667362, 0.7181772, 1.7616143],   # pedestrian
                [0.40246472, 0.4027083, 1.0084083],  # traffic cone
                [2.9183026, 12.112271, 3.8475198],   # trailer
                [2.4189546, 6.516079, 2.8158379],    # truck
            ],
        },
        "INFERENCE": {"NUSC_SAMPLE_AGGREGATE": True, "DO_BEV_NMS": True},
        "NUSC": {
            "MAX_NUM_ATTRIBUTES": 4,
            "LOSS": {"WEIGHT_ATTR": 0.2, "WEIGHT_SPEED": 0.2},
        },
    },
    "SOLVER": {
        "IMS_PER_BATCH": 64,
        "BASE_LR": 0.002,
        "MAX_ITER": 120000,
        "STEPS": [100000, 110000],
        "MIXED_PRECISION_ENABLED": True,
    },
    "TEST": {"IMS_PER_BATCH": 96},
}

EXPERIMENTS = {
    "dd3d_kitti_dla34": DD3D_KITTI_DLA34,
    "dd3d_kitti_dla34_overfit": DD3D_KITTI_DLA34_OVERFIT,
    "dd3d_kitti_v99": DD3D_KITTI_V99,
    "dd3d_nusc_dla34": DD3D_NUSC_DLA34,
}


def get_experiment_cfg(name: str) -> CfgNode:
    cfg = get_cfg()
    if name not in EXPERIMENTS:
        raise KeyError(f"Unknown experiment {name!r}. Available: {sorted(EXPERIMENTS)}")
    return cfg.merge(EXPERIMENTS[name])
