from dd3d_tpu.configs.defaults import get_cfg
from dd3d_tpu.configs.experiments import get_experiment_cfg, EXPERIMENTS

__all__ = ["get_cfg", "get_experiment_cfg", "EXPERIMENTS"]
