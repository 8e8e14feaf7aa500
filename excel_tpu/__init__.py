"""excel_tpu — a TPU-native reimplementation of ExCEL (CVPR 2025 WSSS).

Frozen CLIP ViT-B/16 with architecture surgery, TSE text-semantic enrichment,
SVC non-parametric refinement, PAR, and the trainable LVC head — redesigned
for JAX/XLA/Pallas on TPU. See SURVEY.md for the blueprint.

Public API map (submodules import lazily — importing excel_tpu is cheap):
  config      typed config tree: voc_config / coco_config / tiny_config,
              fast() bf16 preset
  models      encoders (clip), LVC head, losses, composition root (excel),
              parameter conversion (params)
  ops         feature surgery, TSE, SVC affinity, PAR, labels, on-TPU CRF
  engine      pipeline (jittable end-to-end), train, evaluate, checkpoint
  data        datasets, transforms, loader, synthetic fixtures
  parallel    mesh/sharding, multi-host initialize
  crf         native C++ permutohedral dense CRF (ctypes)
  text        BPE tokenizer, class vocabularies
  utils       metrics, logging, visualization, profiling
"""
__version__ = "0.1.0"

__all__ = ["config", "models", "ops", "engine", "data", "parallel", "crf",
           "text", "utils"]


def __getattr__(name):
    if name in __all__:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
