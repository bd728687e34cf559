from lookoncetohear_tpu.serve.engine import StreamingEngine

__all__ = ["StreamingEngine"]
