"""excel_tpu — a TPU-native reimplementation of ExCEL (CVPR 2025 WSSS).

Frozen CLIP ViT-B/16 with architecture surgery, TSE text-semantic enrichment,
SVC non-parametric refinement, PAR, and the trainable LVC head — redesigned
for JAX/XLA/Pallas on TPU. See SURVEY.md for the blueprint.
"""
__version__ = "0.1.0"
