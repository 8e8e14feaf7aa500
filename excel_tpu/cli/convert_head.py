"""Convert a reference ExCEL checkpoint (model_iter_*.pth) to a head .npz.

The reference's train scripts save the full DDP-wrapped `model.state_dict()`
every eval interval (scripts/train_voc.py:254) — frozen CLIP encoder weights
included, `module.`-prefixed. Only the trainable LVC head (SegFormer fuse +
decoder, model/model_excel.py:37-46) actually differs from init, so this
extracts exactly that subtree into the portable `.npz` the `--head` flag of
`cli.infer_lam` / `cli.infer_seg` consumes (and `cli.train` exports).

    python -m excel_tpu.cli.convert_head model_iter_30000.pth head_30000.npz
    python -m excel_tpu.cli.convert_head --dataset coco ckpt.pth head.npz

Offline one-time step; inference never touches torch.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="reference .pth (full ExCEL_model state "
                                "dict, DDP 'module.' prefix ok)")
    ap.add_argument("dst", help="output head .npz")
    ap.add_argument("--dataset", default="voc", choices=["voc", "coco"],
                    help="head geometry preset (block/layer counts)")
    args = ap.parse_args(argv)

    from ..config import coco_config, voc_config
    from ..engine.checkpoint import save_head_npz
    from ..models.excel import convert_torch_head
    from .convert_clip import load_torch_state_dict

    sd = load_torch_state_dict(args.src)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    cfg = coco_config() if args.dataset == "coco" else voc_config()
    head = convert_torch_head(sd, cfg)
    save_head_npz(args.dst, head)
    n = sum(v.size for v in sd.values())
    import jax

    kept = sum(x.size for x in jax.tree_util.tree_leaves(head))
    print(f"wrote {args.dst}: {kept:,} head params "
          f"(of {n:,} in the checkpoint; frozen CLIP weights dropped)")


if __name__ == "__main__":
    main()
