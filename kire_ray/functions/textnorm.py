"""Text normalization mirroring the reference's label handling.

``_handleLabel`` (/root/reference/ATLOP+KIRE/data/gen_kg_data.py:92-94)::

    str(label).replace('\\n', ' ').replace('.', '').replace('-', ' ').lower()

``tokenizer_1`` (gen_kg_data.py:24-28) pads punctuation with spaces then
splits on whitespace.  Both have a scalar form (shared with the
sequential oracle in oracle/pyoracle.py) and a vectorized Arrow form
used inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PUNCT = [",", ".", "|", "?", "？", "'", "\\", '"']


def normalize_label(label: str) -> str:
    """Scalar mirror of the reference's ``_handleLabel``."""
    return str(label).replace("\n", " ").replace(".", "").replace("-", " ").lower()


def normalize_label_column(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``_handleLabel`` over an Arrow string column."""
    col = pc.replace_substring(col, "\n", " ")
    col = pc.replace_substring(col, ".", "")
    col = pc.replace_substring(col, "-", " ")
    return pc.utf8_lower(col)


def punct_tokenize(sentence: str) -> list[str]:
    """Scalar mirror of the reference's ``tokenizer_1``."""
    for char in _PUNCT:
        sentence = sentence.replace(char, " " + char + " ")
    return sentence.split()


def whitespace_tokenize(text: str) -> list[str]:
    """Turn text → word tokens.  Transcript turns are space-tokenizable
    by construction (FIXTURES.md §1); this is the document word grid the
    reference's sentence model assumes (ATLOP+KIRE/prepro.py:37-44)."""
    return text.split()
