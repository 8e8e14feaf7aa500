#!/usr/bin/env python
"""Convert the reference repo's data assets into excel_tpu's own formats.

Run once at build time (requires /root/reference mounted). Everything written
under assets/ is *data* (vocabularies, split lists, embedding banks), not code:

- BPE merge table  (reference: clip/bpe_simple_vocab_16e6.txt.gz — the public
  OpenAI CLIP vocab)                      -> assets/bpe_merges.txt.gz
- GPT-4 attribute descriptor JSONs (reference: attributes_text/*.json)
                                           -> assets/attributes/<ds>_descriptors.json
- Precomputed attribute cluster banks (reference: attributes_text/*.pth,
  torch pickles of [cluster_bank (512,K), class_flags (C,K)])
                                           -> assets/attributes/<ds>_bank_<K>.npz
- VOC/COCO split lists (reference: datasets/{voc,coco}/*.txt)
                                           -> assets/splits/{voc,coco}/*.txt
- VOC image-level one-hot labels (reference: datasets/voc/cls_labels_onehot.npy,
  a pickled dict name->(20,) float32)      -> assets/splits/voc/cls_labels.npz
  (COCO's equivalent is a missing large blob in the snapshot; regenerate from
   annotations with tools/make_cls_labels.py when the dataset is present.)
"""
import gzip
import json
import os
import sys

import numpy as np

REF = "/root/reference"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(ROOT, "assets")


def convert_bpe():
    src = os.path.join(REF, "clip", "bpe_simple_vocab_16e6.txt.gz")
    lines = gzip.open(src).read().decode("utf-8").split("\n")
    # reference slices merges[1 : 49152-256-2+1] (simple_tokenizer.py:67)
    merges = lines[1 : 49152 - 256 - 2 + 1]
    out = os.path.join(ASSETS, "bpe_merges.txt.gz")
    with gzip.open(out, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    print(f"bpe: {len(merges)} merges -> {out}")


def convert_attr_banks():
    import torch

    specs = [
        ("descriptors_pascal_voc_gpt4.0_cluster_a_photo_of4.json",
         "pascal_voc_desc_clip_ViT-B-16_gpt4.0_cluster_112_embedding_bank.pth",
         "pascal_voc", 112),
        ("descriptors_ms_coco_gpt4.0_cluster_a_photo_of4.json",
         "ms_coco_desc_clip_ViT-B-16_gpt4.0_cluster_224_embedding_bank.pth",
         "ms_coco", 224),
    ]
    for json_name, pth_name, ds, k in specs:
        with open(os.path.join(REF, "attributes_text", json_name)) as f:
            desc = json.load(f)
        out_json = os.path.join(ASSETS, "attributes", f"{ds}_descriptors.json")
        with open(out_json, "w") as f:
            json.dump(desc, f, indent=1)
        bank, flags = torch.load(
            os.path.join(REF, "attributes_text", pth_name), map_location="cpu")
        out_npz = os.path.join(ASSETS, "attributes", f"{ds}_bank_{k}.npz")
        np.savez(out_npz,
                 cluster_bank=np.asarray(bank, dtype=np.float32),
                 class_flags=np.asarray(flags, dtype=np.float32))
        print(f"{ds}: {len(desc)} classes, bank {tuple(np.asarray(bank).shape)} "
              f"flags {tuple(np.asarray(flags).shape)} -> {out_npz}")


def convert_splits():
    for ds in ("voc", "coco"):
        src_dir = os.path.join(REF, "datasets", ds)
        dst_dir = os.path.join(ASSETS, "splits", ds)
        for name in sorted(os.listdir(src_dir)):
            if not name.endswith(".txt"):
                continue
            names = np.loadtxt(os.path.join(src_dir, name), dtype=str)
            with open(os.path.join(dst_dir, name), "w") as f:
                f.write("\n".join(names.tolist()) + "\n")
            print(f"{ds}/{name}: {len(names)} entries")


def convert_cls_labels():
    src = os.path.join(REF, "datasets", "voc", "cls_labels_onehot.npy")
    d = np.load(src, allow_pickle=True).item()
    names = sorted(d.keys())
    mat = np.stack([d[n] for n in names]).astype(np.uint8)
    out = os.path.join(ASSETS, "splits", "voc", "cls_labels.npz")
    np.savez_compressed(out, names=np.array(names), labels=mat)
    print(f"voc cls labels: {mat.shape} -> {out}")


if __name__ == "__main__":
    if not os.path.isdir(REF):
        sys.exit("reference repo not mounted at /root/reference")
    convert_bpe()
    convert_attr_banks()
    convert_splits()
    convert_cls_labels()
