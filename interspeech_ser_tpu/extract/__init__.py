from .pipeline import SpeechExtractionPipeline, WhisperExtractionPipeline, TextExtractionPipeline

__all__ = [
    "SpeechExtractionPipeline",
    "WhisperExtractionPipeline",
    "TextExtractionPipeline",
]
