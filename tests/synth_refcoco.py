"""Synthetic RefCOCO fixture: writes the reference's on-disk formats with tiny data."""

import json
import os
import pickle

import numpy as np
from PIL import Image


def make_synth_refcoco(root, n_images=4, sents_per_ann=2, seed=0):
    """Creates <root>/coco/train2014/*.jpg and <root>/refs/refcoco/{instances.json,
    refs(unc).p}. Returns (coco_dir, ref_dir).

    ``sents_per_ann`` may be an int or a sequence (cycled per annotation) so tests
    can create anns with differing reference counts (the zip(*) truncation path).
    """
    if isinstance(sents_per_ann, int):
        sents_per_ann = [sents_per_ann]
    rng = np.random.default_rng(seed)
    coco_dir = os.path.join(root, "coco")
    ref_dir = os.path.join(root, "refs", "refcoco")
    os.makedirs(os.path.join(coco_dir, "train2014"), exist_ok=True)
    os.makedirs(ref_dir, exist_ok=True)

    annotations, refs = [], []
    sent_id, ann_id, ref_id = 0, 0, 0
    captions_pool = [
        "the red dog on the left",
        "a small cat next to the chair",
        "the man wearing a blue shirt",
        "the big green car in front",
        "a woman sitting on the right",
        "the black hat on the table",
    ]
    splits = ["train", "train", "val", "testA"]
    for i in range(n_images):
        image_id = 1000 + i
        h, w = int(rng.integers(120, 260)), int(rng.integers(120, 260))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(coco_dir, "train2014", f"COCO_train2014_{image_id:012d}.jpg"),
            quality=90,
        )
        x = float(rng.uniform(2, w * 0.4))
        y = float(rng.uniform(2, h * 0.4))
        bw = float(rng.uniform(20, w * 0.5))
        bh = float(rng.uniform(20, h * 0.5))
        annotations.append(
            {"id": ann_id, "image_id": image_id, "bbox": [x, y, bw, bh], "category_id": 1}
        )
        sentences = []
        for _ in range(sents_per_ann[i % len(sents_per_ann)]):
            sentences.append({"sent_id": sent_id, "sent": captions_pool[sent_id % len(captions_pool)]})
            sent_id += 1
        refs.append(
            {
                "ann_id": ann_id,
                "ref_id": ref_id,
                "image_id": image_id,
                "split": splits[i % len(splits)],
                "file_name": f"COCO_train2014_{image_id:012d}_{ann_id}.jpg",
                "sentences": sentences,
            }
        )
        ann_id += 1
        ref_id += 1

    with open(os.path.join(ref_dir, "instances.json"), "w") as f:
        json.dump({"annotations": annotations}, f)
    with open(os.path.join(ref_dir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    return coco_dir, ref_dir
