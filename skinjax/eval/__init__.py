from skinjax.eval import artifacts, plots, stats

__all__ = ["artifacts", "plots", "stats"]
