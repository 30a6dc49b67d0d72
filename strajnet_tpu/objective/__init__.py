from strajnet_tpu.objective.pr_auc import pr_auc
from strajnet_tpu.objective.loss import OGMFlowLoss, ogmflow_loss
from strajnet_tpu.objective.metrics import (
    compute_occupancy_flow_metrics,
    MetricsAccumulator,
)
from strajnet_tpu.objective.schedule import cosine_decay_restarts, transformer_schedule

__all__ = [
    "pr_auc",
    "OGMFlowLoss",
    "ogmflow_loss",
    "compute_occupancy_flow_metrics",
    "MetricsAccumulator",
    "cosine_decay_restarts",
    "transformer_schedule",
]
