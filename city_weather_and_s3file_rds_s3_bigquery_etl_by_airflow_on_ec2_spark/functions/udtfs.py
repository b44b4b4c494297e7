"""Python UDTFs (Spark 4 user-defined table functions) — the
engine's escape hatch for one-row-to-many-rows transforms that aren't
a plain ``explode`` (SURVEY.md §2.11 surface).

``TokenizeWithOffsets`` is the corpus-pipeline canonical example: text
→ (token, position, char_offset) rows, the shape span-level annotation
pipelines need. It is deliberately also expressible with posexplode +
aggregate expressions — tests assert the UDTF and the expression
variant agree, keeping the Python path honest.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token: string, pos: int, char_offset: int")
class TokenizeWithOffsets:
    """Whitespace tokenization with character offsets."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        offset = 0
        pos = 0
        i = 0
        n = len(text)
        while i < n:
            if text[i].isspace():
                i += 1
                continue
            start = i
            while i < n and not text[i].isspace():
                i += 1
            yield (text[start:i], pos, start)
            pos += 1
        _ = offset
