from skinjax.serve.engine import (InferenceEngine, preprocess_image,
                                  preprocess_image_u8)

__all__ = ["InferenceEngine", "preprocess_image", "preprocess_image_u8"]
