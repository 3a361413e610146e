from celebbasis_tpu.text.tokenizer import CLIPTokenizer, SyntheticVocab

__all__ = ["CLIPTokenizer", "SyntheticVocab"]
