"""Pipeline models: fused preprocessing programs + the standalone engine."""
from .pipeline import (
    STAGE_TIMING_KEYS,
    PipelineParams,
    PipelineSettings,
    build_pipeline,
    pipeline_runner,
    params_from_config,
    settings_from_config,
    stage_functions,
)
from .preprocessor import Preprocessor
