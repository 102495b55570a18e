from .pipelines import (
    DEFAULT_FEATURES,
    add_binary_label_and_weights,
    binary_metrics,
    build_price_features,
    classifier_pipeline,
    directional_accuracy,
    regression_metrics,
    regression_pipeline,
    rolling_origin_search,
    score_with_price_reconstruction,
    time_split,
)

__all__ = [
    "DEFAULT_FEATURES",
    "add_binary_label_and_weights",
    "build_price_features",
    "classifier_pipeline",
    "regression_pipeline",
    "rolling_origin_search",
    "time_split",
    "binary_metrics",
    "regression_metrics",
    "directional_accuracy",
    "score_with_price_reconstruction",
]
