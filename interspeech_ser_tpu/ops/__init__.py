from .gru import BiGRU, gru_scan
from .attention import TorchMultiheadAttention, attention_pool

__all__ = ["BiGRU", "gru_scan", "TorchMultiheadAttention", "attention_pool"]
