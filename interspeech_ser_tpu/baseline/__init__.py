from . import data, models, podcast

__all__ = ["data", "models", "podcast"]
