"""Convert an OpenAI CLIP checkpoint (.pt) to the excel_tpu param format.

The reference downloads jit-scripted OpenAI checkpoints at run time
(clip/clip.py:32-84, the `_MODELS` URL table with the ExCEL_ViT-B/16 alias
pointing at the standard ViT-B/16 weights). Here conversion is a one-time
offline step; training/inference never touch torch.

    python -m excel_tpu.cli.convert_clip ViT-B-16.pt assets/clip_vit_b16.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.jit.load(path, map_location="cpu").state_dict() \
        if _is_jit_archive(path) else torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.float().numpy() if hasattr(v, "numpy") else v)
            for k, v in obj.items()}


def _is_jit_archive(path: str) -> bool:
    import zipfile

    try:
        with zipfile.ZipFile(path) as z:
            return any(n.endswith("constants.pkl") for n in z.namelist())
    except zipfile.BadZipFile:
        return False


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="OpenAI CLIP .pt (jit archive or state dict)")
    ap.add_argument("dst", help="output .npz")
    args = ap.parse_args(argv)

    from ..models.params import (convert_torch_state_dict, infer_clip_config,
                                 save_params_npz)

    sd = load_torch_state_dict(args.src)
    sd = {k: v for k, v in sd.items()
          if not k.startswith("input_resolution")
          and k not in ("context_length", "vocab_size")}
    cfg = infer_clip_config(sd)
    print(f"detected: vision {cfg.vision_layers}x{cfg.vision_width} "
          f"patch {cfg.patch_size}, text {cfg.text_layers}x{cfg.text_width}, "
          f"embed {cfg.embed_dim}")
    params = convert_torch_state_dict(sd, cfg)
    save_params_npz(args.dst, params)
    print(f"saved -> {args.dst}")


if __name__ == "__main__":
    main()
