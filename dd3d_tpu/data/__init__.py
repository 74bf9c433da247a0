"""Data pipeline: datasets, host-side augmentations, static-shape batching.

TPU-first design (SURVEY.md §7): all augmentation/decoding runs on host in
numpy (cv2 for image IO/resize), and batches are emitted with STATIC bucketed
shapes — image padded to size_divisibility, GT padded to MAX_GT_PER_IMAGE —
so the compiled train/infer step never recompiles. This replaces the
reference's ImageList dynamic padding (tridet/structures/image_list.py) and
detectron2 dataloader plumbing (tridet/data/build.py).
"""
from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog, register_datasets

__all__ = ["DatasetCatalog", "MetadataCatalog", "register_datasets"]
