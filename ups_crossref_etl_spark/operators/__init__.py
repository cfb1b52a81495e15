from . import dedup, similarity, text_analysis, multimodal  # noqa: F401
