"""Dataset class-name registry (``mmdet/core/evaluation/class_names.py``
parity): ``get_classes('coco'|'voc'|'cityscapes'|'wider_face'|
'deepfashion')`` returns the canonical label tuple.
"""

from __future__ import annotations


def coco_classes():
    from dsl_tpu.data.datasets.coco import COCO_CLASSES

    return list(COCO_CLASSES)


def voc_classes():
    from dsl_tpu.data.datasets.voc import VOC_CLASSES

    return list(VOC_CLASSES)


def cityscapes_classes():
    from dsl_tpu.data.datasets.lvis import CityscapesDataset

    return list(CityscapesDataset.CLASSES)


def wider_face_classes():
    return ["face"]


def deepfashion_classes():
    from dsl_tpu.data.datasets.lvis import DeepFashionDataset

    return list(DeepFashionDataset.CLASSES)


_ALIASES = {
    "coco": coco_classes,
    "voc": voc_classes, "pascal_voc": voc_classes,
    "cityscapes": cityscapes_classes,
    "wider_face": wider_face_classes, "widerface": wider_face_classes,
    "deepfashion": deepfashion_classes,
}


def get_classes(dataset: str) -> list[str]:
    """Class names of a named dataset (reference ``get_classes``)."""
    key = dataset.lower()
    if key not in _ALIASES:
        raise ValueError(f"Unrecognized dataset: {dataset} "
                         f"(known: {sorted(_ALIASES)})")
    return _ALIASES[key]()
