from .metrics import cer, der, wer

__all__ = ["cer", "der", "wer"]
