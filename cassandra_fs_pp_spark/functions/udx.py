"""User-extension surface examples (SURVEY §2.11).

The engine's stance is built-ins first — no UDF is *required* for reference
parity — but the full extension surface stays open for operations with no
SQL form. One worked example per API:

* scalar ``@pandas_udf`` (Arrow-vectorized): Unicode NFC normalization —
  locale/Unicode tables live in Python, not SQL.
* Python ``@udtf`` (table function, 1->N rows): sentence segmentation with
  character offsets — the LLM-preprocessing splitter shape.

(The other APIs are demonstrated elsewhere: ``mapInPandas`` in
functions/multimodal, ``applyInPandas`` in operators/spectral,
``applyInPandasWithState`` in streaming/filestream.)
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("string")
def normalize_nfc(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization, Arrow-batched (é composed vs e+◌́ ->
    one canonical form before hashing/dedup)."""
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


_SENT_RE = re.compile(r"[^.!?]*[.!?]+|[^.!?]+$")


@udtf(returnType="sent_idx int, start_off int, end_off int, sentence string")
class SplitSentences:
    """1->N table function: naive sentence segmentation with char offsets.

    Usage::

        SplitSentences(F.lit(text))                       # DataFrame API
        spark.udtf.register("split_sentences", SplitSentences)
        SELECT s.* FROM docs, LATERAL split_sentences(text) s
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        idx = 0
        for m in _SENT_RE.finditer(text):
            raw = m.group(0)
            s = raw.strip()
            if s:
                # offsets delimit the STRIPPED sentence, so
                # text[start_off:end_off] == sentence holds
                lead = len(raw) - len(raw.lstrip())
                start = m.start() + lead
                yield idx, start, start + len(s), s
                idx += 1
