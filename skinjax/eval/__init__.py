from skinjax.eval import artifacts

__all__ = ["artifacts"]
