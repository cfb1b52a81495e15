"""Python UDTF (user-defined table function) surface — Spark 4 API parity.

One demonstration UDTF: per-row chunk-span expansion, the same contract as
``operators/sampling.chunk_spans``. The UDTF exists to cover the API (SQL
``LATERAL`` joins against Python table functions, registration, yield-based
row expansion) and as the template for kernels that genuinely need Python
(a real tokenizer, a model call). For plain arithmetic expansion the
JVM-native ``sequence``+``explode`` form in sampling.py IS the production
path — a row-at-a-time Python UDTF pays interpreter + pickle cost per row
and cannot enter whole-stage codegen (tests pin output equality, not
speed, for exactly that reason; see §2.10 UDF policy).
"""

from __future__ import annotations

try:  # pragma: no cover - API present in PySpark >= 3.5
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_start int, chunk_len int")
    class ChunkSpansUDTF:
        """LATERAL-joinable chunk expansion: for a document of ``n_tok``
        tokens, yield (chunk_idx, chunk_start, chunk_len) windows of
        ``chunk_size`` tokens with ``overlap`` carried between chunks —
        byte-identical contract to ``sampling.chunk_spans``."""

        def eval(self, n_tok: int, chunk_size: int, overlap: int):
            if n_tok is None or n_tok <= 0:
                return
            stride = chunk_size - overlap
            import math

            n_chunks = max(1, math.ceil((n_tok - overlap) / stride))
            for i in range(n_chunks):
                start = i * stride
                yield i, start, min(chunk_size, n_tok - start)

    def register_udtfs(spark) -> None:
        """Register all UDTFs for SQL use (``LATERAL chunk_spans_udtf(...)``)."""
        spark.udtf.register("chunk_spans_udtf", ChunkSpansUDTF)

except ImportError:  # pragma: no cover
    ChunkSpansUDTF = None  # type: ignore[assignment]

    def register_udtfs(spark) -> None:  # type: ignore[misc]
        raise NotImplementedError("pyspark.sql.functions.udtf not available")
