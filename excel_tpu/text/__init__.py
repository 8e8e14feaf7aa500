from .tokenizer import ClipTokenizer, get_tokenizer, tokenize, CONTEXT_LENGTH
from . import class_names
