"""Python UDTF surface (Spark 4 user-defined table functions).

One real UDTF so the API family is covered end-to-end (registration,
lateral join, schema contract): a token-window chunker that expands each
document into fixed-size chunk rows. UDTFs execute row-at-a-time Python
— the engine's slow path (CLAUDE.md/SURVEY rule: built-ins or Arrow
batches for hot paths) — so this exists as API coverage and for genuinely
imperative per-row expansions, NOT as the production chunker
(functions/text.py `concat_chunk_spans` is the codegen form). The
output is deterministic and SQL-replayable, so the query carrying it is
oracle-checked like any built-in: the UDTF's Python body is held to the
same hash gate as the rest of the engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk_md5 string")
class ChunkTokens:
    """Expand one document into fixed-width token chunks.

    For each input (text, chunk_size): yields one row per consecutive
    chunk of `chunk_size` whitespace tokens (last chunk may be short),
    with the chunk's token count and the md5 of the space-joined chunk.
    """

    def eval(self, text: str, chunk_size: int):
        toks = [t for t in (text or "").split(" ") if t != ""]
        for i in range(0, len(toks), chunk_size):
            chunk = toks[i : i + chunk_size]
            joined = " ".join(chunk)
            yield (
                i // chunk_size,
                len(chunk),
                hashlib.md5(joined.encode("utf-8")).hexdigest(),
            )
