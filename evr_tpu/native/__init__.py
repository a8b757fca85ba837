from .loader import NativeStager, native_available, build_native

__all__ = ["NativeStager", "native_available", "build_native"]
