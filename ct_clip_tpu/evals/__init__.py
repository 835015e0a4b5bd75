from .metrics import (bootstrap_metric, bootstrap_report, choose_operating_point,
                      compute_cis, evaluate_external, evaluate_internal,
                      plot_pr, plot_roc, roc_distance_threshold)
from .retrieval import report_to_volume, volume_to_volume
from .tsne import tsne_plot

__all__ = ["bootstrap_metric", "bootstrap_report", "choose_operating_point",
           "compute_cis", "evaluate_external", "evaluate_internal", "plot_pr",
           "plot_roc", "roc_distance_threshold", "report_to_volume",
           "volume_to_volume", "tsne_plot"]
