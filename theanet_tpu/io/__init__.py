from .pipeline import HostPipeline, native_lib

__all__ = ["HostPipeline", "native_lib"]
