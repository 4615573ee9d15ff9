from .fusion import MultiModalEmotionClassifier

__all__ = ["MultiModalEmotionClassifier"]
