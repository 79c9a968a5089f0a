from .bpe import ClipTokenizer, OpenClipTokenizer, Tokenizer, tokenize_text

__all__ = ["ClipTokenizer", "OpenClipTokenizer", "Tokenizer", "tokenize_text"]
