"""Offline TSE attribute-bank builder (reference model/load_attr.py:10-84).

Encodes each class's GPT-4 descriptor sentences with the CLIP text encoder,
KMeans-clusters all embeddings, and saves [cluster_bank (embed, K),
class_flags (C, K)] as .npz — the bank consumed by attr_aggregate at model
init. The bundled assets/attributes/*_bank_*.npz were converted from the
reference's precomputed banks; this tool regenerates them from the
descriptor JSONs (e.g. for a new dataset or cluster count).

    python -m excel_tpu.cli.make_attr_bank --dataset voc \
        --clip-params assets/clip_vit_b16.npz --out my_bank.npz
"""
from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from ..config import asset_path
from ..models.clip import text_forward
from ..text.tokenizer import tokenize
from .common import add_common_args, build_config, load_clip


def descriptors_from_txt(txt_path: str, class_names: list[str],
                         prompt: str = "a clean origami {}. ",
                         entries_per_cls: int = 20) -> dict:
    """Raw GPT-4 descriptor dump -> {class: [prefixed sentences]}
    (reference attributes_text/transform_txt2json.py:5-24: per class, skip
    2 header lines, take `entries_per_cls` quoted lines, strip the JSON-ish
    quoting, prefix the prompt template)."""
    with open(txt_path) as f:
        content = f.readlines()
    descriptors = {}
    index_up = 0
    for cls in class_names:
        index_low = index_up + 2
        index_up = index_low + entries_per_cls
        values = content[index_low:index_up]
        index_up += 2
        descriptors[cls] = [prompt.format(cls)
                            + item.strip('  "').strip('",\n')
                            for item in values]
    return descriptors


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--descriptors", default=None,
                    help="descriptor JSON (default: bundled per dataset)")
    ap.add_argument("--from-txt", default=None,
                    help="raw GPT-4 descriptor txt dump; converted to the "
                         "descriptor JSON first (transform_txt2json.py "
                         "semantics), written next to --out")
    ap.add_argument("--clusters", type=int, default=None,
                    help="K (default: 112 VOC / 224 COCO)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    cfg = build_config(args)
    clip_params = load_clip(args, cfg)
    ds_name = "pascal_voc" if args.dataset == "voc" else "ms_coco"
    desc_file = args.descriptors or asset_path(
        "attributes", f"{ds_name}_descriptors.json")
    k = args.clusters or cfg.num_attr_clusters

    if args.from_txt:
        from ..text.class_names import class_list
        names = class_list(ds_name)[1:]          # drop background
        descriptions = descriptors_from_txt(args.from_txt, names)
        json_path = args.out.rsplit(".", 1)[0] + "_descriptors.json"
        with open(json_path, "w") as fp:
            json.dump(descriptions, fp, indent=4)
        print(f"converted {args.from_txt} -> {json_path}")
    else:
        with open(desc_file) as f:
            descriptions = json.load(f)

    # per-class sentence embeddings, L2-normalized (load_attr.py:24-34)
    all_emb, class_idx = [], []
    for ci, (class_name, sentences) in enumerate(descriptions.items()):
        tokens = tokenize([s.lower() for s in sentences])
        emb = np.asarray(text_forward(clip_params, jnp.asarray(tokens),
                                      cfg.clip))
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        all_emb.append(emb)
        class_idx.extend([ci] * len(sentences))
        print(f"encoded {class_name}: {emb.shape[0]} sentences")
    emb_all = np.concatenate(all_emb, axis=0)
    class_idx = np.asarray(class_idx)

    from sklearn.cluster import KMeans
    km = KMeans(n_clusters=k, random_state=0).fit(emb_all)

    num_classes = len(descriptions)
    flags = np.zeros((num_classes, k), np.float32)
    for ci in range(num_classes):
        flags[ci, np.unique(km.labels_[class_idx == ci])] = 1.0

    # warn on classes with identical cluster signatures (load_attr.py:56-63)
    uniq, counts = np.unique(flags, axis=0, return_counts=True)
    if not (counts == 1).all():
        print("WARNING: classes share identical cluster activations")

    np.savez(args.out, cluster_bank=km.cluster_centers_.T.astype(np.float32),
             class_flags=flags)
    print(f"saved bank [{cfg.clip.embed_dim}, {k}] + flags "
          f"[{num_classes}, {k}] -> {args.out}")


if __name__ == "__main__":
    main()
