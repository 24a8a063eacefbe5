from .scores import logits_score_fn, LOGITS_METHODS  # noqa: F401
from .methods import (  # noqa: F401
    DISTANCE_METHODS,
    OOD_METHOD_CHOICES,
    DistanceOODMethod,
    FusionOODMethod,
    LogitsOODMethod,
    fuse_decisions,
)
from .thresholds import (  # noqa: F401
    generate_thresholds_per_class,
    generate_thresholds_per_class_per_stride,
)
from .matching import match_predictions_to_targets  # noqa: F401
