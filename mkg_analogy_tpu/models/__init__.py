from .unimo import UnimoConfig, TextConfig, VisionConfig, UnimoForMaskedLM

__all__ = ["UnimoConfig", "TextConfig", "VisionConfig", "UnimoForMaskedLM"]
