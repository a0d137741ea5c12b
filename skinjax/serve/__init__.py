from skinjax.serve.engine import InferenceEngine, preprocess_image

__all__ = ["InferenceEngine", "preprocess_image"]
