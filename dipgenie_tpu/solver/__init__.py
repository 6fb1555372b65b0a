from .anchors import AnchorData, compute_and_classify_anchors
from .pipeline import Pipeline, PipelineConfig
