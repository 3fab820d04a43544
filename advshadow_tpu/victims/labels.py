"""Label-map handling for the victim zoo.

The reference carries four ``{"id2label": {"0": name, ...}}`` JSONs with
*different orderings per classifier family* (config.json / config1.json /
config2.json / configvit.json, loaded as label_to_int at
ref: test.py:16-23, ASR_fast.py:67-75).  ASR evaluation recovers the true
class from the attacked file's name prefix, so per-victim orderings must
be preserved exactly.
"""

from __future__ import annotations

import json
from typing import Dict, List

__all__ = ["load_id2label", "label_to_int", "OXFORD_PET_CLASSES",
           "true_label_from_filename"]

#: canonical Oxford-IIIT Pet ordering (config.json, the fastai/timm map)
OXFORD_PET_CLASSES: List[str] = [
    "Abyssinian", "Bengal", "Birman", "Bombay", "British_Shorthair",
    "Egyptian_Mau", "Maine_Coon", "Persian", "Ragdoll", "Russian_Blue",
    "Siamese", "Sphynx", "american_bulldog", "american_pit_bull_terrier",
    "basset_hound", "beagle", "boxer", "chihuahua", "english_cocker_spaniel",
    "english_setter", "german_shorthaired", "great_pyrenees", "havanese",
    "japanese_chin", "keeshond", "leonberger", "miniature_pinscher",
    "newfoundland", "pomeranian", "pug", "saint_bernard", "samoyed",
    "scottish_terrier", "shiba_inu", "staffordshire_bull_terrier",
    "wheaten_terrier", "yorkshire_terrier",
]


def load_id2label(path: str) -> Dict[int, str]:
    """Load an ``{"id2label": {...}}`` JSON (ref: test.py:16-23)."""
    with open(path) as f:
        data = json.load(f)
    return {int(k): v for k, v in data["id2label"].items()}


def label_to_int(id2label: Dict[int, str]) -> Dict[str, int]:
    """Invert id2label (ref: ASR_fast.py:67-75)."""
    return {v: k for k, v in id2label.items()}


def true_label_from_filename(filename: str) -> str:
    """Class name from an attacked file's name prefix, e.g.
    ``Abyssinian_12.png`` -> ``Abyssinian`` (ref: ASR_fast.py:109)."""
    stem = filename.rsplit(".", 1)[0]
    return stem.rsplit("_", 1)[0]
