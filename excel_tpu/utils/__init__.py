from .logutils import AverageMeter, Eta, setup_logger
from .metrics import (format_metrics_table, init_hist, scores_from_hist,
                      update_hist, update_hist_np, update_hist_pseudo)
from .visual import cam_overlay, colormap, encode_cmap, save_palette_png

__all__ = ["AverageMeter", "Eta", "setup_logger", "format_metrics_table",
           "init_hist", "scores_from_hist", "update_hist", "update_hist_np",
           "update_hist_pseudo", "cam_overlay", "colormap", "encode_cmap",
           "save_palette_png"]
