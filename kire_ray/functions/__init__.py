from kire_ray.functions.hashing import hash64, hash64_str, score01
from kire_ray.functions.textnorm import (
    normalize_label,
    normalize_label_column,
    whitespace_tokenize,
)

__all__ = [
    "hash64",
    "hash64_str",
    "score01",
    "normalize_label",
    "normalize_label_column",
    "whitespace_tokenize",
]
