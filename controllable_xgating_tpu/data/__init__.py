from controllable_xgating_tpu.data.tokenizer import PTBTokenizer, ptb_tokenize
from controllable_xgating_tpu.data.postag import PennTagger, tag_tokens
from controllable_xgating_tpu.data.vocab import Vocab, BOS, EOS, PAD, UNK

__all__ = [
    "PTBTokenizer",
    "ptb_tokenize",
    "PennTagger",
    "tag_tokens",
    "Vocab",
    "BOS",
    "EOS",
    "PAD",
    "UNK",
]
