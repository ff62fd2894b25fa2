from .api import KGSamplerLib, NativeTrainLoader, NativeTestLoader

__all__ = ["KGSamplerLib", "NativeTrainLoader", "NativeTestLoader"]
