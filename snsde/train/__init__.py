from .checkpoint import (
    load_checkpoint,
    load_pytree,
    save_checkpoint,
    save_pytree,
)
from .loop import (
    FitResult,
    TrainConfig,
    bce_with_logits,
    fit_classifier,
    iterate_batches,
    softmax_cross_entropy,
    weight_regularization,
)
from .metrics import (
    ClassificationMetrics,
    auroc,
    average_precision,
    classification_metrics,
    confusion_matrix,
    masked_mse,
)
from .schedule import CosineAnnealingLR, ReduceLROnPlateau, StepLR
