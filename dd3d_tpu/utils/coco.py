"""COCO-format dataset cache exporter, rebuild of `tridet/utils/coco.py`.

The reference serializes dataset dicts into a COCO-format JSON at dataset
registration (utils/coco.py:151-193) for its COCO evaluator and external
tooling interop. Our COCO evaluator consumes the catalog directly, but the
JSON export remains useful for interop, so the same surface is provided.
"""
import json
import logging
import os
from typing import List, Optional

LOG = logging.getLogger(__name__)


def create_coco_format_cache(dataset_dicts: List[dict], class_names: List[str],
                             dataset_name: str, cache_dir: str = "/tmp") -> str:
    images, annotations = [], []
    ann_id = 1
    for img_id, d in enumerate(dataset_dicts):
        images.append(
            {
                "id": img_id,
                "file_name": d.get("file_name", ""),
                "width": int(d.get("width", 0)),
                "height": int(d.get("height", 0)),
                "image_id_str": str(d.get("image_id", img_id)),
            }
        )
        for a in d.get("annotations", []):
            x1, y1, x2, y2 = a["bbox"]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(a["category_id"]),
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "area": float(max(x2 - x1, 0) * max(y2 - y1, 0)),
                    "iscrowd": 0,
                    **({"bbox3d": list(map(float, a["bbox3d"]))} if "bbox3d" in a else {}),
                }
            )
            ann_id += 1

    payload = {
        "info": {"description": dataset_name},
        "images": images,
        "annotations": annotations,
        "categories": [{"id": i, "name": n} for i, n in enumerate(class_names)],
    }
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{dataset_name}_coco_format.json")
    with open(path, "w") as f:
        json.dump(payload, f)
    LOG.info("COCO-format cache: %s (%d images, %d annotations)", path, len(images), len(annotations))
    return path
