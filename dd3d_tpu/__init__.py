"""dd3d_tpu — a TPU-native (JAX/XLA/Pallas) monocular 3D object detection framework.

A from-scratch rebuild of the capabilities of TRI-ML/dd3d (ICCV 2021) designed
for TPU hardware: NHWC conv stacks compiled by XLA onto the MXU, shape-static
inference decode + NMS kernels, vectorized FCOS target assignment, and
`jax.sharding`-based data parallelism over device meshes.

Reference capability map: see SURVEY.md at the repo root. Reference files are
cited in docstrings as `tridet/<path>:<line>` for parity checking.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience API (avoids importing jax at package import)."""
    if name == "get_cfg":
        from dd3d_tpu.configs import get_cfg

        return get_cfg
    if name == "get_experiment_cfg":
        from dd3d_tpu.configs import get_experiment_cfg

        return get_experiment_cfg
    if name == "build_model":
        from dd3d_tpu.models import build_model

        return build_model
    raise AttributeError(name)
